"""Generate the checked-in BSA golden-count regression fixture.

The reference pipeline carries a bundled BSA test profile
(``/root/reference/conf/test.config:19-28`` — six BSA mzML runs searched
against an 18-protein target+decoy fasta, decoy affix ``rev``) and a
golden-count regression corpus (``data/public-submissions.csv`` —
expected PSM counts per project).  This script is the engine's offline
analogue: it authors a kilobyte-scale GENUINE-FORMAT pair —

- ``BSA1_F1.mzML``: 64 MS2 spectra, Thermo nativeID scan ids, spec-
  required 0-based ``index`` attributes, base64 float64 peak arrays
  (every 4th intensity array zlib-compressed) with proper CV params;
- ``bsa.mzid``: one PSM per spectrum against a BSA-centric 18-protein
  target/decoy space (``rev_`` affix, 25% decoy rows), real tryptic BSA
  peptide sequences, UNIMOD:4/UNIMOD:35 modifications on C/M residues,
  MS:1002257 scores shaped so the q<=0.01 gate keeps most targets;

plus ``golden_counts.json``, the frozen per-stage row counts that
``tests/test_golden_fixture.py`` asserts through ``run-pipeline``.

Deterministic: every byte is a pure function of the constants below.
Regenerate (only when the fixture itself is being changed on purpose)
with::

    PYTHONPATH=/root/repo python tests/data/gen_bsa_fixture.py

and review the golden-count diff like any other behavior change.
"""

from __future__ import annotations

import base64
import json
import os
import struct
import zlib

OUT = os.path.dirname(os.path.abspath(__file__))

# Real tryptic BSA peptides (P02769) + a few from the other proteins the
# reference's 18-protein detergent-trace fasta carries.  (sequence,
# protein accession).  Sequences < 7 AA exercise the peptide-length gate.
PEPTIDES = [
    ("LVNELTEFAK", "sp|P02769|ALBU_BOVIN"),
    ("AEFVEVTK", "sp|P02769|ALBU_BOVIN"),
    ("YLYEIAR", "sp|P02769|ALBU_BOVIN"),
    ("HLVDEPQNLIK", "sp|P02769|ALBU_BOVIN"),
    ("LGEYGFQNALIVR", "sp|P02769|ALBU_BOVIN"),
    ("DDPHACYSTVFDK", "sp|P02769|ALBU_BOVIN"),
    ("QTALVELLK", "sp|P02769|ALBU_BOVIN"),
    ("SLHTLFGDELCK", "sp|P02769|ALBU_BOVIN"),
    ("DAFLGSFLYEYSR", "sp|P02769|ALBU_BOVIN"),
    ("RHPEYAVSVLLR", "sp|P02769|ALBU_BOVIN"),
    ("KVPQVSTPTLVEVSR", "sp|P02769|ALBU_BOVIN"),
    ("CCTESLVNR", "sp|P02769|ALBU_BOVIN"),
    ("TVMENFVAFVDK", "sp|P02769|ALBU_BOVIN"),
    ("ETYGDMADCCEK", "sp|P02769|ALBU_BOVIN"),
    ("LCVLHEK", "sp|P02769|ALBU_BOVIN"),
    ("SHCIAEVEK", "sp|P02769|ALBU_BOVIN"),
    ("YICDNQDTISSK", "sp|P02769|ALBU_BOVIN"),
    ("GLVLIAFSQYLQQCPFDEHVK", "sp|P02769|ALBU_BOVIN"),
    ("VPQVSTPTLVEVSR", "sp|P02769|ALBU_BOVIN"),
    ("MPCTEDYLSLILNR", "sp|P02769|ALBU_BOVIN"),
    ("EYEATLEECCAK", "sp|P02769|ALBU_BOVIN"),
    ("ADLAK", "sp|P02769|ALBU_BOVIN"),          # < 7 AA: length-filtered
    ("SEIAHR", "sp|P02769|ALBU_BOVIN"),          # < 7 AA: length-filtered
    ("VASLRETYGDMADCCEK", "sp|P02769|ALBU_BOVIN"),
    ("DLGEEHFK", "sp|P02769|ALBU_BOVIN"),
    ("AWSVAR", "sp|P00761|TRYP_PIG"),            # < 7 AA: length-filtered
    ("LSSPATLNSR", "sp|P00761|TRYP_PIG"),
    ("IITHPNFNGNTLDNDIMLIK", "sp|P00761|TRYP_PIG"),
    ("SSGTSYPDVLK", "sp|P00761|TRYP_PIG"),
    ("VATVSLPR", "sp|P00761|TRYP_PIG"),
    ("LLIYGASTR", "sp|P00921|CAH2_BOVIN"),
    ("AVVQDPALKPLALVYGEATSR", "sp|P00921|CAH2_BOVIN"),
]

# average residue masses (sufficient realism for precursor m/z)
AA_MASS = {
    "A": 71.08, "R": 156.19, "N": 114.10, "D": 115.09, "C": 103.14,
    "E": 129.12, "Q": 128.13, "G": 57.05, "H": 137.14, "I": 113.16,
    "L": 113.16, "K": 128.17, "M": 131.19, "F": 147.18, "P": 97.12,
    "S": 87.08, "T": 101.10, "W": 186.21, "Y": 163.18, "V": 99.13,
}
WATER, PROTON = 18.02, 1.00728

N_SPECTRA = 64


def _lcg(seed: int):
    state = seed
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        yield state / float(1 << 63)


def peptide_mz(seq: str, z: int) -> float:
    m = sum(AA_MASS[a] for a in seq) + WATER
    return round((m + z * PROTON) / z, 4)


def _b64(values, compress=False) -> str:
    raw = struct.pack(f"<{len(values)}d", *values)
    if compress:
        raw = zlib.compress(raw)
    return base64.b64encode(raw).decode()


def spectra() -> list[dict]:
    rng = _lcg(20260814)
    out = []
    for i in range(N_SPECTRA):
        seq, acc = PEPTIDES[i % len(PEPTIDES)]
        z = 2 + (i % 2)
        mz = peptide_mz(seq, z)
        # pseudo b/y ladder: prefix/suffix masses + noise peaks
        masses, intens = [], []
        run = 0.0
        for a in seq[:-1]:
            run += AA_MASS[a]
            masses.append(round(run + PROTON, 4))
            intens.append(round(1000.0 * next(rng) + 50.0, 2))
        run = 0.0
        for a in reversed(seq[1:]):
            run += AA_MASS[a]
            masses.append(round(run + WATER + PROTON, 4))
            intens.append(round(1000.0 * next(rng) + 50.0, 2))
        for _ in range(6):  # noise
            masses.append(round(200.0 + 1400.0 * next(rng), 4))
            intens.append(round(60.0 * next(rng) + 1.0, 2))
        order = sorted(range(len(masses)), key=lambda j: masses[j])
        out.append({
            "scan": i + 1,
            "index": i,
            "id": f"controllerType=0 controllerNumber=1 scan={i + 1}",
            "seq": seq,
            "acc": acc,
            "z": z,
            "mz": mz,
            "rt": round(120.0 + 7.5 * i, 2),
            "masses": [masses[j] for j in order],
            "intens": [intens[j] for j in order],
        })
    return out


def write_mzml(specs: list[dict]) -> None:
    parts = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<mzML xmlns="http://psi.hupo.org/ms/mzml" version="1.1.0">',
        '  <run id="BSA1_F1" defaultInstrumentConfigurationRef="IC1">',
        f'  <spectrumList count="{len(specs)}" defaultDataProcessingRef="DP1">',
    ]
    for s in specs:
        compress = s["index"] % 4 == 0
        n = len(s["masses"])
        parts.append(f'''   <spectrum index="{s['index']}" id="{s['id']}" defaultArrayLength="{n}">
    <cvParam cvRef="MS" accession="MS:1000511" name="ms level" value="2"/>
    <cvParam cvRef="MS" accession="MS:1000580" name="MSn spectrum" value=""/>
    <scanList count="1">
     <scan>
      <cvParam cvRef="MS" accession="MS:1000016" name="scan start time" value="{s['rt']}" unitName="second"/>
     </scan>
    </scanList>
    <precursorList count="1">
     <precursor>
      <selectedIonList count="1">
       <selectedIon>
        <cvParam cvRef="MS" accession="MS:1000744" name="selected ion m/z" value="{s['mz']}"/>
        <cvParam cvRef="MS" accession="MS:1000041" name="charge state" value="{s['z']}"/>
       </selectedIon>
      </selectedIonList>
     </precursor>
    </precursorList>
    <binaryDataArrayList count="2">
     <binaryDataArray>
      <cvParam cvRef="MS" accession="MS:1000523" name="64-bit float" value=""/>
      <cvParam cvRef="MS" accession="MS:1000576" name="no compression" value=""/>
      <cvParam cvRef="MS" accession="MS:1000514" name="m/z array" value=""/>
      <binary>{_b64(s['masses'])}</binary>
     </binaryDataArray>
     <binaryDataArray>
      <cvParam cvRef="MS" accession="MS:1000523" name="64-bit float" value=""/>
      <cvParam cvRef="MS" accession="MS:{'1000574" name="zlib compression' if compress else '1000576" name="no compression'}" value=""/>
      <cvParam cvRef="MS" accession="MS:1000515" name="intensity array" value=""/>
      <binary>{_b64(s['intens'], compress=compress)}</binary>
     </binaryDataArray>
    </binaryDataArrayList>
   </spectrum>''')
    parts += ["  </spectrumList>", " </run>", "</mzML>", ""]
    with open(os.path.join(OUT, "bsa_fixture", "BSA1_F1.mzML"), "w") as fh:
        fh.write("\n".join(parts))


def write_mzid(specs: list[dict]) -> None:
    rng = _lcg(99)
    seqs, evs, results = {}, [], []
    db = {}
    for i, s in enumerate(specs):
        decoy = i % 4 == 3
        acc = ("rev_" + s["acc"]) if decoy else s["acc"]
        db.setdefault(acc, f"DBSeq_{len(db)}")
        pid = f"Pep_{i}"
        mods = []
        for pos, a in enumerate(s["seq"], start=1):
            if a == "C":
                mods.append(
                    f'   <Modification location="{pos}" residues="C" monoisotopicMassDelta="57.021464">\n'
                    f'    <cvParam cvRef="UNIMOD" accession="UNIMOD:4" name="Carbamidomethyl"/>\n'
                    f"   </Modification>"
                )
            elif a == "M" and i % 2 == 0:
                mods.append(
                    f'   <Modification location="{pos}" residues="M" monoisotopicMassDelta="15.994915">\n'
                    f'    <cvParam cvRef="UNIMOD" accession="UNIMOD:35" name="Oxidation"/>\n'
                    f"   </Modification>"
                )
        seqs[pid] = (
            f'  <Peptide id="{pid}">\n   <PeptideSequence>{s["seq"]}</PeptideSequence>\n'
            + ("\n".join(mods) + "\n" if mods else "")
            + "  </Peptide>"
        )
        evs.append(
            f'  <PeptideEvidence id="PE_{i}" peptide_ref="{pid}" '
            f'dBSequence_ref="{db[acc]}" isDecoy="{str(decoy).lower()}"/>'
        )
        # targets score high, decoys low, mild deterministic jitter
        score = round((0.35 + 0.25 * next(rng)) if decoy else (0.80 + 0.19 * next(rng)), 6)
        results.append(f'''  <SpectrumIdentificationResult id="SIR_{i}" spectrumID="{s['id']}" spectraData_ref="SD_1">
   <SpectrumIdentificationItem id="SII_{i}" rank="1" chargeState="{s['z']}" experimentalMassToCharge="{s['mz']}" peptide_ref="{pid}" passThreshold="true">
    <PeptideEvidenceRef peptideEvidence_ref="PE_{i}"/>
    <cvParam cvRef="PSI-MS" accession="MS:1002257" name="Comet:expectation value" value="{score}"/>
   </SpectrumIdentificationItem>
  </SpectrumIdentificationResult>''')
    dbs = "\n".join(
        f'  <DBSequence id="{v}" accession="{k}" searchDatabase_ref="SDB_1"/>'
        for k, v in db.items()
    )
    doc = f'''<?xml version="1.0" encoding="UTF-8"?>
<MzIdentML xmlns="http://psidev.info/psi/pi/mzIdentML/1.1" version="1.1.0">
 <SequenceCollection>
{dbs}
{chr(10).join(seqs.values())}
{chr(10).join(evs)}
 </SequenceCollection>
 <DataCollection>
  <Inputs>
   <SearchDatabase id="SDB_1" location="file:///data/18Protein_SoCe_Tr_detergents_trace_target_decoy.fasta"/>
   <SpectraData id="SD_1" location="file:///data/BSA1_F1.mzML">
    <SpectrumIDFormat><cvParam cvRef="PSI-MS" accession="MS:1000768" name="Thermo nativeID format"/></SpectrumIDFormat>
   </SpectraData>
  </Inputs>
  <AnalysisData>
   <SpectrumIdentificationList id="SIL_1">
{chr(10).join(results)}
   </SpectrumIdentificationList>
  </AnalysisData>
 </DataCollection>
</MzIdentML>
'''
    with open(os.path.join(OUT, "bsa_fixture", "bsa.mzid"), "w") as fh:
        fh.write(doc)


def write_mztab(specs: list[dict]) -> None:
    """The SAME identifications as :func:`write_mzid`, in genuine mzTab —
    identical decoy flags, scores (same LCG stream), and modifications,
    so the two result formats must drive ``run-pipeline`` to IDENTICAL
    golden counts (cross-format fidelity is the regression)."""
    rng = _lcg(99)
    lines = [
        "MTD\tmzTab-version\t1.0.0",
        "MTD\tmzTab-mode\tComplete",
        "MTD\tmzTab-type\tIdentification",
        "MTD\tms_run[1]-location\tfile:///data/BSA1_F1.mzML",
        "MTD\tpsm_search_engine_score[1]\t[MS, MS:1002257, Comet:expectation value, ]",
        "PSH\tsequence\tPSM_ID\taccession\tunique\tdatabase\tdatabase_version\t"
        "search_engine\tsearch_engine_score[1]\tmodifications\tspectra_ref\t"
        "retention_time\tcharge\texp_mass_to_charge\tcalc_mass_to_charge\t"
        "opt_global_cv_MS:1002217_decoy_peptide",
    ]
    for i, s in enumerate(specs):
        decoy = i % 4 == 3
        acc = ("rev_" + s["acc"]) if decoy else s["acc"]
        mods = []
        for pos, a in enumerate(s["seq"], start=1):
            if a == "C":
                mods.append(f"{pos}-UNIMOD:4")
            elif a == "M" and i % 2 == 0:
                mods.append(f"{pos}-UNIMOD:35")
        score = round((0.35 + 0.25 * next(rng)) if decoy else (0.80 + 0.19 * next(rng)), 6)
        lines.append(
            f"PSM\t{s['seq']}\t{i}\t{acc}\t1\tsp_target_decoy\t2020_01\t"
            f"[MS, MS:1002251, Comet, ]\t{score}\t{','.join(mods) or 'null'}\t"
            f"ms_run[1]:{s['id']}\t{s['rt']}\t{s['z']}\t{s['mz']}\t{s['mz']}\t"
            f"{1 if decoy else 0}"
        )
    # author-supplied PRT/PEP sections (a Complete-mode mzTab carries
    # them; the reference's PIA model keeps these rows — the engine's
    # plans.ingest.read_author_proteins is the pass-through surface):
    # one PRT row per distinct accession with its best PSM score, one
    # PEP row per distinct (sequence, accession)
    prot: dict[str, dict] = {}
    pep: dict[tuple, dict] = {}
    rng = _lcg(99)  # same stream → same scores as the PSM rows
    for i, s in enumerate(specs):
        decoy = i % 4 == 3
        acc = ("rev_" + s["acc"]) if decoy else s["acc"]
        score = round((0.35 + 0.25 * next(rng)) if decoy else (0.80 + 0.19 * next(rng)), 6)
        p = prot.setdefault(acc, {"decoy": decoy, "best": score, "n": 0})
        p["best"] = max(p["best"], score)
        p["n"] += 1
        pep.setdefault((s["seq"], acc), {"decoy": decoy, "best": score, "ref": s["id"]})
    lines.append(
        "PRH\taccession\tdescription\ttaxid\tspecies\tdatabase\tdatabase_version\t"
        "best_search_engine_score[1]\tambiguity_members\tmodifications\t"
        "protein_coverage\topt_global_cv_PRIDE:0000303_decoy_hit"
    )
    for acc, p in sorted(prot.items()):
        lines.append(
            f"PRT\t{acc}\tnull\t9913\tBos taurus\tsp_target_decoy\t2020_01\t"
            f"{p['best']}\tnull\tnull\tnull\t{1 if p['decoy'] else 0}"
        )
    lines.append(
        "PEH\tsequence\taccession\tunique\tbest_search_engine_score[1]\t"
        "modifications\tretention_time\tcharge\tmass_to_charge\tspectra_ref"
    )
    for (seq, acc), q in sorted(pep.items()):
        lines.append(
            f"PEP\t{seq}\t{acc}\t1\t{q['best']}\tnull\tnull\tnull\tnull\t"
            f"ms_run[1]:{q['ref']}"
        )
    with open(os.path.join(OUT, "bsa_fixture", "bsa.mztab"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def write_pridexml(specs: list[dict]) -> None:
    """The SAME identifications again, as a legacy PRIDE XML document —
    the third result format of the cross-format fidelity gate.  Identical
    decoy flags (via the PRIDE:0000303 cvParam — legacy accessions carry
    no ``rev_``-style marker the reader recognizes), identical scores
    (same LCG stream), identical UNIMOD modifications; precursor mz and
    charge resolve from an embedded mzData spectrum per scan whose id
    equals the mzML scan number, so ``SpectrumReference`` lands on the
    same normalized spectrumKey as the mzid's Thermo nativeID."""
    rng = _lcg(99)
    mzdata, idents = [], []
    for i, s in enumerate(specs):
        mzdata.append(
            f'''    <spectrum id="{s['scan']}">
     <spectrumDesc><spectrumSettings>
      <spectrumInstrument msLevel="2"/>
     </spectrumSettings>
      <precursorList count="1"><precursor msLevel="1" spectrumRef="0">
       <ionSelection>
        <cvParam cvLabel="PSI" accession="PSI:1000040" name="MassToChargeRatio" value="{s['mz']}"/>
        <cvParam cvLabel="PSI" accession="PSI:1000041" name="ChargeState" value="{s['z']}"/>
       </ionSelection>
      </precursor></precursorList>
     </spectrumDesc>
     <mzArrayBinary><data precision="64" endian="little" length="0"></data></mzArrayBinary>
     <intenArrayBinary><data precision="64" endian="little" length="0"></data></intenArrayBinary>
    </spectrum>'''
        )
        decoy = i % 4 == 3
        acc = ("rev_" + s["acc"]) if decoy else s["acc"]
        mods = []
        for pos, a in enumerate(s["seq"], start=1):
            if a == "C":
                mods.append(
                    f'''    <ModificationItem>
     <ModLocation>{pos}</ModLocation>
     <ModAccession>UNIMOD:4</ModAccession>
     <ModDatabase>UNIMOD</ModDatabase>
     <additional><cvParam cvLabel="UNIMOD" accession="UNIMOD:4" name="Carbamidomethyl" value=""/></additional>
    </ModificationItem>'''
                )
            elif a == "M" and i % 2 == 0:
                mods.append(
                    f'''    <ModificationItem>
     <ModLocation>{pos}</ModLocation>
     <ModAccession>UNIMOD:35</ModAccession>
     <ModDatabase>UNIMOD</ModDatabase>
     <additional><cvParam cvLabel="UNIMOD" accession="UNIMOD:35" name="Oxidation" value=""/></additional>
    </ModificationItem>'''
                )
        score = round((0.35 + 0.25 * next(rng)) if decoy else (0.80 + 0.19 * next(rng)), 6)
        decoy_cv = (
            '\n   <additional><cvParam cvLabel="PRIDE" accession="PRIDE:0000303" '
            'name="Decoy hit" value="1"/></additional>'
            if decoy
            else ""
        )
        idents.append(
            f'''  <GelFreeIdentification>
   <Accession>{acc}</Accession>
   <Database>sp_target_decoy</Database>
   <DatabaseVersion>2020_01</DatabaseVersion>
   <PeptideItem>
    <Sequence>{s['seq']}</Sequence>
    <SpectrumReference>{s['scan']}</SpectrumReference>
{chr(10).join(mods)}
    <additional>
     <cvParam cvLabel="PSI-MS" accession="MS:1002257" name="Comet expectation score" value="{score}"/>
    </additional>
   </PeptideItem>
   <Score>{score}</Score>
   <SearchEngine>Comet</SearchEngine>{decoy_cv}
  </GelFreeIdentification>'''
        )
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<ExperimentCollection version="2.1">\n'
        " <Experiment>\n"
        "  <Title>BSA golden fixture (legacy PRIDE XML)</Title>\n"
        '  <mzData version="1.05" accessionNumber="0">\n'
        f'   <spectrumList count="{len(specs)}">\n'
        + "\n".join(mzdata)
        + "\n   </spectrumList>\n  </mzData>\n"
        + "\n".join(idents)
        + "\n </Experiment>\n</ExperimentCollection>\n"
    )
    with open(os.path.join(OUT, "bsa_fixture", "bsa.pride.xml"), "w") as fh:
        fh.write(doc)


def write_mzml_f2(specs: list[dict]) -> None:
    """``BSA1_F2.mzML`` — the SAME spectra as F1 (identical ids, RTs,
    precursors, peak counts) but with the binary arrays MS-Numpress
    encoded, cycling through all six numpress CV accessions the mzML
    kernel dispatches (plain linear/pic/slof + each numpress-then-zlib
    variant).  Pairing it with F1 in one two-file project makes the r11
    numpress decode path a FULL-PIPELINE golden gate instead of a
    unit-level twin-parity check.  (pic quantizes intensities to ints
    and linear/slof are fixed-point — peak VALUES differ from F1 within
    codec error, which no pipeline count depends on.)"""
    from pride_spark.sources import numpress

    def b64b(raw: bytes) -> str:
        return base64.b64encode(raw).decode()

    def arr(values, codec: str, with_zlib: bool, kind: str) -> str:
        acc = {
            ("linear", False): ("MS:1002312", "MS-Numpress linear prediction compression"),
            ("pic", False): ("MS:1002313", "MS-Numpress positive integer compression"),
            ("slof", False): ("MS:1002314", "MS-Numpress short logged float compression"),
            ("linear", True): ("MS:1002746", "MS-Numpress linear prediction compression followed by zlib compression"),
            ("pic", True): ("MS:1002747", "MS-Numpress positive integer compression followed by zlib compression"),
            ("slof", True): ("MS:1002748", "MS-Numpress short logged float compression followed by zlib compression"),
        }[(codec, with_zlib)]
        enc = {
            "linear": numpress.encode_linear,
            "pic": numpress.encode_pic,
            "slof": numpress.encode_slof,
        }[codec]
        raw = enc(values)
        if with_zlib:
            raw = zlib.compress(raw)
        kind_acc, kind_name = (
            ("MS:1000514", "m/z array") if kind == "mz"
            else ("MS:1000515", "intensity array")
        )
        return (
            "     <binaryDataArray>\n"
            f'      <cvParam cvRef="MS" accession="{acc[0]}" name="{acc[1]}" value=""/>\n'
            f'      <cvParam cvRef="MS" accession="{kind_acc}" name="{kind_name}" value=""/>\n'
            f"      <binary>{b64b(raw)}</binary>\n"
            "     </binaryDataArray>"
        )

    parts = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<mzML xmlns="http://psi.hupo.org/ms/mzml" version="1.1.0">',
        '  <run id="BSA1_F2" defaultInstrumentConfigurationRef="IC1">',
        f'  <spectrumList count="{len(specs)}" defaultDataProcessingRef="DP1">',
    ]
    for s in specs:
        i = s["index"]
        if i % 3 == 0:
            mz_arr = arr(s["masses"], "linear", False, "mz")
            in_arr = arr(s["intens"], "slof", False, "inten")
        elif i % 3 == 1:
            mz_arr = arr(s["masses"], "linear", True, "mz")
            in_arr = arr(s["intens"], "pic", False, "inten")
        else:
            mz_arr = (
                "     <binaryDataArray>\n"
                '      <cvParam cvRef="MS" accession="MS:1000523" name="64-bit float" value=""/>\n'
                '      <cvParam cvRef="MS" accession="MS:1000576" name="no compression" value=""/>\n'
                '      <cvParam cvRef="MS" accession="MS:1000514" name="m/z array" value=""/>\n'
                f"      <binary>{_b64(s['masses'])}</binary>\n"
                "     </binaryDataArray>"
            )
            in_arr = arr(s["intens"], "slof", True, "inten")
        n = len(s["masses"])
        parts.append(f'''   <spectrum index="{s['index']}" id="{s['id']}" defaultArrayLength="{n}">
    <cvParam cvRef="MS" accession="MS:1000511" name="ms level" value="2"/>
    <cvParam cvRef="MS" accession="MS:1000580" name="MSn spectrum" value=""/>
    <scanList count="1">
     <scan>
      <cvParam cvRef="MS" accession="MS:1000016" name="scan start time" value="{s['rt']}" unitName="second"/>
     </scan>
    </scanList>
    <precursorList count="1">
     <precursor>
      <selectedIonList count="1">
       <selectedIon>
        <cvParam cvRef="MS" accession="MS:1000744" name="selected ion m/z" value="{s['mz']}"/>
        <cvParam cvRef="MS" accession="MS:1000041" name="charge state" value="{s['z']}"/>
       </selectedIon>
      </selectedIonList>
     </precursor>
    </precursorList>
    <binaryDataArrayList count="2">
{mz_arr}
{in_arr}
    </binaryDataArrayList>
   </spectrum>''')
    parts += ["  </spectrumList>", " </run>", "</mzML>", ""]
    with open(os.path.join(OUT, "bsa_fixture", "BSA1_F2.mzML"), "w") as fh:
        fh.write("\n".join(parts))


def write_mzid_two(specs: list[dict]) -> None:
    """``bsa_two.mzid`` — the two-file project: the same 64
    identifications ONCE PER spectra file (SD_1 → BSA1_F1.mzML plain
    arrays, SD_2 → BSA1_F2.mzML numpress arrays), identical score
    streams per file.  Because the score MULTISET doubles
    proportionally, every FDR/q-value decision matches the single-file
    run — so the two-file golden counts relate to the one-file golden by
    exact invariants the test asserts (archive doubles, distinct
    peptides/proteins unchanged)."""
    seqs, evs, db = {}, [], {}
    file_results = {1: [], 2: []}
    for i, s in enumerate(specs):
        decoy = i % 4 == 3
        acc = ("rev_" + s["acc"]) if decoy else s["acc"]
        db.setdefault(acc, f"DBSeq_{len(db)}")
        pid = f"Pep_{i}"
        mods = []
        for pos, a in enumerate(s["seq"], start=1):
            if a == "C":
                mods.append(
                    f'   <Modification location="{pos}" residues="C" monoisotopicMassDelta="57.021464">\n'
                    f'    <cvParam cvRef="UNIMOD" accession="UNIMOD:4" name="Carbamidomethyl"/>\n'
                    f"   </Modification>"
                )
            elif a == "M" and i % 2 == 0:
                mods.append(
                    f'   <Modification location="{pos}" residues="M" monoisotopicMassDelta="15.994915">\n'
                    f'    <cvParam cvRef="UNIMOD" accession="UNIMOD:35" name="Oxidation"/>\n'
                    f"   </Modification>"
                )
        seqs[pid] = (
            f'  <Peptide id="{pid}">\n   <PeptideSequence>{s["seq"]}</PeptideSequence>\n'
            + ("\n".join(mods) + "\n" if mods else "")
            + "  </Peptide>"
        )
        evs.append(
            f'  <PeptideEvidence id="PE_{i}" peptide_ref="{pid}" '
            f'dBSequence_ref="{db[acc]}" isDecoy="{str(decoy).lower()}"/>'
        )
    for f in (1, 2):
        rng = _lcg(99)  # same stream per file → identical scores
        for i, s in enumerate(specs):
            decoy = i % 4 == 3
            score = round(
                (0.35 + 0.25 * next(rng)) if decoy else (0.80 + 0.19 * next(rng)), 6
            )
            file_results[f].append(f'''  <SpectrumIdentificationResult id="SIR_F{f}_{i}" spectrumID="{s['id']}" spectraData_ref="SD_{f}">
   <SpectrumIdentificationItem id="SII_F{f}_{i}" rank="1" chargeState="{s['z']}" experimentalMassToCharge="{s['mz']}" peptide_ref="Pep_{i}" passThreshold="true">
    <PeptideEvidenceRef peptideEvidence_ref="PE_{i}"/>
    <cvParam cvRef="PSI-MS" accession="MS:1002257" name="Comet:expectation value" value="{score}"/>
   </SpectrumIdentificationItem>
  </SpectrumIdentificationResult>''')
    dbs = "\n".join(
        f'  <DBSequence id="{v}" accession="{k}" searchDatabase_ref="SDB_1"/>'
        for k, v in db.items()
    )
    nl = chr(10)
    doc = f'''<?xml version="1.0" encoding="UTF-8"?>
<MzIdentML xmlns="http://psidev.info/psi/pi/mzIdentML/1.1" version="1.1.0">
 <SequenceCollection>
{dbs}
{nl.join(seqs.values())}
{nl.join(evs)}
 </SequenceCollection>
 <DataCollection>
  <Inputs>
   <SearchDatabase id="SDB_1" location="file:///data/18Protein_SoCe_Tr_detergents_trace_target_decoy.fasta"/>
   <SpectraData id="SD_1" location="file:///data/BSA1_F1.mzML">
    <SpectrumIDFormat><cvParam cvRef="PSI-MS" accession="MS:1000768" name="Thermo nativeID format"/></SpectrumIDFormat>
   </SpectraData>
   <SpectraData id="SD_2" location="file:///data/BSA1_F2.mzML">
    <SpectrumIDFormat><cvParam cvRef="PSI-MS" accession="MS:1000768" name="Thermo nativeID format"/></SpectrumIDFormat>
   </SpectraData>
  </Inputs>
  <AnalysisData>
   <SpectrumIdentificationList id="SIL_1">
{nl.join(file_results[1])}
{nl.join(file_results[2])}
   </SpectrumIdentificationList>
  </AnalysisData>
 </DataCollection>
</MzIdentML>
'''
    with open(os.path.join(OUT, "bsa_fixture", "bsa_two.mzid"), "w") as fh:
        fh.write(doc)


def main() -> None:
    os.makedirs(os.path.join(OUT, "bsa_fixture"), exist_ok=True)
    specs = spectra()
    write_mzml(specs)
    write_mzid(specs)
    write_mztab(specs)
    write_pridexml(specs)
    write_mzml_f2(specs)
    write_mzid_two(specs)
    print("wrote BSA1_F1.mzML + bsa.mzid + bsa.mztab + bsa.pride.xml + "
          "BSA1_F2.mzML (numpress) + bsa_two.mzid; run the pipeline once "
          "and freeze golden_counts.json / golden_counts_two_files.json "
          "(see tests/test_golden_fixture.py)")


if __name__ == "__main__":
    main()
