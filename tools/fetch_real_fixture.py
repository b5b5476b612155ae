"""Fetch the reference's REAL BSA test data and pin replicated counts.

The reference pipeline's test profile runs six genuinely-real BSA mzML
files (Thermo instrument output, converted) against an 18-protein
target+decoy FASTA (``/root/reference/conf/test.config:19-28``; the
files live in the public nf-core test-datasets repository).  The
engine's committed BSA fixture (``tests/data/bsa_fixture/``) is
genuine-FORMAT but synthetic-content; this tool closes the remaining
"field-correct" gap on a networked machine by downloading the actual
bytes and freezing a replicated-counts manifest:

- per-file spectrum counts as read by the engine's mzML scanner
  (whole mode), plus sha1 of every file — ``manifest.json``;
- ``tests/test_real_fixture.py`` then runs on every later checkout:
  re-reads each file, asserts the engine still reproduces the frozen
  counts, and checks whole==split scan parity on real instrument ids.

Network-optional by design (same seam as ``refresh_ws_fixtures.py``):
this sandbox has none, so the default run validates any EXISTING
downloaded data against its manifest and exits 0 (or prints how to
fetch, if absent).  With ``--fetch`` (networked machine) it downloads
to a temp dir, validates every file parses and counts are nonzero, and
only then moves the set into place (no torn fixture on a failed fetch).

Usage:
    python tools/fetch_real_fixture.py            # validate if present
    python tools/fetch_real_fixture.py --fetch    # download + freeze
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATADIR = os.path.join(REPO, "tests", "data", "real_bsa")
MANIFEST = os.path.join(DATADIR, "manifest.json")

# the exact inputs of the reference's test profile
# (/root/reference/conf/test.config:19-28)
BASE = "https://raw.githubusercontent.com/nf-core/test-datasets/proteomicslfq/testdata"
MZML = [f"BSA{r}_F{f}.mzML" for r in (1, 2, 3) for f in (1, 2)]
FASTA = "18Protein_SoCe_Tr_detergents_trace_target_decoy.fasta"


def _sha1(path: str) -> str:
    h = hashlib.sha1()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _spectrum_counts(dirpath: str) -> dict[str, int]:
    """Per-file spectrum counts via the engine's own mzML scanner."""
    from pride_spark.session import get_spark
    from pride_spark.sources.mzml import read_mzml

    spark = get_spark("real-fixture")
    counts = {}
    for name in MZML:
        p = os.path.join(dirpath, name)
        n = read_mzml(spark, [p]).count()
        if n <= 0:
            raise ValueError(f"{name}: engine read 0 spectra — refusing to freeze")
        counts[name] = n
    return counts


def validate() -> int:
    if not os.path.isdir(DATADIR) or not os.path.exists(MANIFEST):
        print(
            "real BSA data not present (offline sandbox).  On a networked "
            "machine run:\n    python tools/fetch_real_fixture.py --fetch\n"
            "and commit tests/data/real_bsa/ — tests/test_real_fixture.py "
            "then runs the replicated-counts regression on real bytes."
        )
        return 0
    man = json.load(open(MANIFEST))
    for name, meta in man["files"].items():
        p = os.path.join(DATADIR, name)
        if not os.path.exists(p):
            raise SystemExit(f"manifest lists {name} but the file is missing")
        got = _sha1(p)
        if got != meta["sha1"]:
            raise SystemExit(f"{name}: sha1 drift {got} != {meta['sha1']}")
    print(f"manifest OK: {len(man['files'])} files, sha1 verified")
    return 0


def fetch() -> int:
    # staged NEXT TO the target so the final publish is one same-device
    # rename (a /tmp staging dir could be another filesystem -> EXDEV)
    os.makedirs(os.path.dirname(DATADIR), exist_ok=True)
    tmp = tempfile.mkdtemp(
        dir=os.path.dirname(DATADIR), prefix=".real_bsa_stage_"
    )
    try:
        for name in MZML + [FASTA]:
            url = f"{BASE}/{name}"
            print(f"fetching {url}")
            with urllib.request.urlopen(url, timeout=120) as resp:
                with open(os.path.join(tmp, name), "wb") as out:
                    shutil.copyfileobj(resp, out)
        counts = _spectrum_counts(tmp)  # validates every file parses
        manifest = {
            "source": BASE,
            "provenance": "reference conf/test.config test profile inputs",
            "files": {
                name: {
                    "sha1": _sha1(os.path.join(tmp, name)),
                    "bytes": os.path.getsize(os.path.join(tmp, name)),
                    **({"spectra": counts[name]} if name in counts else {}),
                }
                for name in MZML + [FASTA]
            },
        }
        # manifest joins the staged set, then ONE directory swap (r12
        # review): a per-file move loop could crash mid-way and leave an
        # OLD manifest next to NEW files — a torn fixture the docstring
        # promises cannot happen.  Same retire-then-rename shape as the
        # hypertable partition swap.
        with open(os.path.join(tmp, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        os.makedirs(os.path.dirname(DATADIR), exist_ok=True)
        retired = DATADIR + ".old"
        shutil.rmtree(retired, ignore_errors=True)
        if os.path.isdir(DATADIR):
            os.rename(DATADIR, retired)
        os.rename(tmp, DATADIR)
        shutil.rmtree(retired, ignore_errors=True)
        print(f"froze {MANIFEST}: " + ", ".join(f"{k}={v}" for k, v in counts.items()))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fetch", action="store_true", help="download + freeze manifest")
    args = ap.parse_args()
    return fetch() if args.fetch else validate()


if __name__ == "__main__":
    raise SystemExit(main())
