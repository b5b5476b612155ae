"""S3 format readers: mzTab (text-native) and mzIdentML (executor XML)."""

from __future__ import annotations

import textwrap

from pride_spark.sources.mzid import read_mzid_psms, read_mzid_spectra_data
from pride_spark.sources.mztab import read_mztab_ms_runs, read_mztab_psms

MZTAB = (
    "MTD\tmzTab-version\t1.0.0\n"
    "MTD\tms_run[1]-location\tfile:///data/run1.mzML\n"
    "MTD\tms_run[2]-location\tfile:///data/run2.mgf\n"
    "PSH\tsequence\tPSM_ID\taccession\tunique\tsearch_engine_score[1]\t"
    "modifications\tspectra_ref\tretention_time\tcharge\texp_mass_to_charge\n"
    "PSM\tPEPTIDEK\t1\tP12345\t1\t0.001\t3-UNIMOD:21\tms_run[1]:scan=42\t55.2\t2\t445.12\n"
    "PSM\tLNGVK\t2\tQ99999\t0\tnull\tnull\tms_run[2]:index=7\tnull\t3\t512.9\n"
)

MZID = textwrap.dedent("""\
    <?xml version="1.0" encoding="UTF-8"?>
    <MzIdentML xmlns="http://psidev.info/psi/pi/mzIdentML/1.1">
      <SequenceCollection>
        <DBSequence id="DBSeq_1" accession="P12345"/>
        <DBSequence id="DBSeq_2" accession="DECOY_P12345"/>
        <Peptide id="Pep_1">
          <PeptideSequence>PEPTIDEK</PeptideSequence>
          <Modification location="3" monoisotopicMassDelta="79.96633">
            <cvParam accession="UNIMOD:21" name="Phospho" cvRef="UNIMOD"/>
          </Modification>
        </Peptide>
        <PeptideEvidence id="PE_1" peptide_ref="Pep_1" dBSequence_ref="DBSeq_1" isDecoy="false"/>
        <PeptideEvidence id="PE_2" peptide_ref="Pep_1" dBSequence_ref="DBSeq_2" isDecoy="true"/>
      </SequenceCollection>
      <DataCollection>
        <Inputs>
          <SpectraData id="SD_1" location="file:///data/run1.mzML">
            <SpectrumIDFormat><cvParam accession="MS:1000768" name="Thermo nativeID format"/></SpectrumIDFormat>
          </SpectraData>
        </Inputs>
        <AnalysisData>
          <SpectrumIdentificationList id="SIL_1">
            <SpectrumIdentificationResult id="SIR_1" spectrumID="controllerType=0 controllerNumber=1 scan=42" spectraData_ref="SD_1">
              <SpectrumIdentificationItem id="SII_1" rank="1" chargeState="2"
                  experimentalMassToCharge="445.12" peptide_ref="Pep_1" passThreshold="true">
                <PeptideEvidenceRef peptideEvidence_ref="PE_1"/>
                <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.001"/>
              </SpectrumIdentificationItem>
              <SpectrumIdentificationItem id="SII_2" rank="2" chargeState="2"
                  experimentalMassToCharge="445.12" peptide_ref="Pep_1" passThreshold="false">
                <PeptideEvidenceRef peptideEvidence_ref="PE_2"/>
                <cvParam accession="MS:1002257" name="Comet:expectation value" value="0.9"/>
              </SpectrumIdentificationItem>
            </SpectrumIdentificationResult>
          </SpectrumIdentificationList>
        </AnalysisData>
      </DataCollection>
    </MzIdentML>
""")


def test_mztab_psms(spark, tmp_path):
    p = tmp_path / "a.mztab"
    p.write_text(MZTAB)
    rows = {r["psmId"]: r for r in read_mztab_psms(spark, str(p)).collect()}
    assert rows["1"]["peptideSequence"] == "PEPTIDEK"
    assert rows["1"]["proteinAccession"] == "P12345"
    assert rows["1"]["score"] == 0.001
    assert rows["1"]["msRun"] == 1 and rows["1"]["sourceId"] == "scan=42"
    assert rows["1"]["retentionTime"] == 55.2 and rows["1"]["precursorCharge"] == 2
    assert rows["2"]["score"] is None and rows["2"]["retentionTime"] is None
    assert rows["2"]["sourceId"] == "index=7" and rows["2"]["msRun"] == 2

    runs = {r["msRun"]: r["location"] for r in read_mztab_ms_runs(spark, str(p)).collect()}
    assert runs == {1: "file:///data/run1.mzML", 2: "file:///data/run2.mgf"}


def test_mzid_psms_and_spectra_data(spark, tmp_path):
    p = tmp_path / "a.mzid"
    p.write_text(MZID)
    psms = {r["psmId"]: r for r in read_mzid_psms(spark, [str(p)]).collect()}
    assert len(psms) == 2
    target = psms["SII_1"]
    assert target["peptideSequence"] == "PEPTIDEK"
    assert target["sourceId"].endswith("scan=42")
    assert target["proteinAccessions"] == ["P12345"]
    assert target["isDecoy"] is False and target["score"] == 0.001
    assert target["modifications"][0]["position"] == 3
    assert target["modifications"][0]["accession"] == "UNIMOD:21"
    decoy = psms["SII_2"]
    assert decoy["isDecoy"] is True
    assert decoy["proteinAccessions"] == ["DECOY_P12345"]

    sd = read_mzid_spectra_data(spark, [str(p)]).collect()
    assert len(sd) == 1
    assert sd[0]["id"] == "SD_1"
    assert sd[0]["idFormatAccession"] == "MS:1000768"
