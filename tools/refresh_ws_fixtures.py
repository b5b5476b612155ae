"""Refresh the recorded PRIDE WS fixtures (r10 verdict task #8's
follow-through: make the next API drift a one-command refresh + failing
assertion instead of archaeology).

The engine's REST edge (``sources/ws.py``, SURVEY §2.1 S1/S2) binds an
explicit field subset of two public endpoints; the recorded payloads in
``tests/data/ws_fixtures/`` pin that contract.  When the live API
changes shape, this tool re-captures the payloads and the fixture tests
(``tests/test_modifications_ws.py::test_ws_fixture_*``) then fail
EXACTLY on the fields the engine consumes that drifted — extra/new
fields are ignored by design (the reference's Jackson binding is
``@JsonIgnoreProperties``; ``normalize_pride_*`` raises only on missing
consumed fields).

Network-optional by design: this sandbox has none, so the default run
validates the EXISTING fixtures through the same normalize adapters the
tests use and exits 0 — a cheap pre-flight that the committed payloads
still satisfy the contract.  With ``--fetch`` (on a networked machine)
it re-downloads both payloads, validates them, and only then replaces
the committed files (atomic, no torn fixture on a failed fetch).

Usage:
    python tools/refresh_ws_fixtures.py                   # validate only
    python tools/refresh_ws_fixtures.py --fetch           # refresh + validate
    python tools/refresh_ws_fixtures.py --fetch --accession PXD000001
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXDIR = os.path.join(REPO, "tests", "data", "ws_fixtures")


def _validate(accession: str, project: dict, files: list[dict]) -> None:
    """Run both payloads through the engine's strict adapters — these
    raise on any missing/renamed field the engine consumes."""
    from pride_spark.sources.ws import normalize_pride_files, normalize_pride_project

    proj = normalize_pride_project(project)
    if proj.get("accession") != accession:
        raise ValueError(
            f"project payload is for {proj.get('accession')!r}, expected {accession!r}"
        )
    norm = normalize_pride_files(files)
    if not norm:
        raise ValueError("files payload normalized to zero rows")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--accession", default="PXD000001")
    ap.add_argument("--base", default="https://www.ebi.ac.uk/pride/ws/archive/v2")
    ap.add_argument(
        "--fetch", action="store_true",
        help="re-download the payloads before validating (needs network)",
    )
    args = ap.parse_args()
    acc = args.accession

    proj_path = os.path.join(FIXDIR, f"project_{acc}.json")
    files_path = os.path.join(FIXDIR, f"files_byProject_{acc}.json")

    if args.fetch:
        urls = {
            proj_path: f"{args.base}/projects/{acc}",
            files_path: f"{args.base}/files/byProject?accession={acc}",
        }
        fetched: dict[str, object] = {}
        for path, url in urls.items():
            print(f"GET {url}", file=sys.stderr)
            with urllib.request.urlopen(url, timeout=30) as resp:
                fetched[path] = json.loads(resp.read().decode())
        # validate BEFORE replacing anything: a drifted API must fail
        # loudly here, leaving the committed fixtures untouched
        _validate(acc, fetched[proj_path], fetched[files_path])
        for path, payload in fetched.items():
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(payload, fh, indent=1)
                fh.write("\n")
            os.replace(tmp, path)
            print(f"wrote {path}", file=sys.stderr)
    else:
        with open(proj_path) as fh:
            project = json.load(fh)
        with open(files_path) as fh:
            files = json.load(fh)
        _validate(acc, project, files)
        print(f"committed fixtures for {acc} still satisfy the consumed-field "
              "contract (run with --fetch on a networked machine to refresh)",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
