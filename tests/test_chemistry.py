"""Chemistry pack: the rdkit-free SMILES descriptor path.

The rdkit-gated verbs (smiles2mol, fingerprints) stay import-gated in
this container; these tests cover the pure-Python parser
(``utils/smiles.py``) and the Arrow-UDF verb built on it.  Expected
values are hand-derived from the public SMILES grammar and IUPAC 2021
atomic weights (see the derivations in each case), never from the
parser itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj
from pyjanitor_spark.utils.smiles import (
    hill_formula,
    parse_smiles,
    smiles_descriptors,
)


# (smiles, formula, mol_weight, hbd, hba, rings)
KNOWN = [
    # ethanol: 2C + 6H + O = 24.022 + 6.048 + 15.999
    ("CCO", "C2H6O", 46.069, 1, 1, 0),
    # aspirin, aromatic and Kekule spellings must agree
    ("CC(=O)Oc1ccccc1C(=O)O", "C9H8O4", 180.159, 1, 4, 1),
    ("CC(=O)OC1=CC=CC=C1C(=O)O", "C9H8O4", 180.159, 1, 4, 1),
    # caffeine: N-methylated aromatic n atoms carry no H
    ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", "C8H10N4O2", 194.194, 0, 6, 2),
    ("c1ccccc1", "C6H6", 78.114, 0, 0, 1),       # benzene
    ("c1ccncc1", "C5H5N", 79.102, 0, 1, 1),      # pyridine: n -> 0H
    ("c1cc[nH]c1", "C4H5N", 67.091, 1, 1, 1),    # pyrrole needs [nH]
    ("c1ccsc1", "C4H4S", 84.136, 0, 0, 1),       # thiophene: s -> 0H
    ("c1ccoc1", "C4H4O", 68.075, 0, 1, 1),       # furan: o -> 0H
    ("O", "H2O", 18.015, 1, 1, 0),
    ("[NH4+]", "H4N", 18.039, 1, 1, 0),
    ("N#N", "N2", 28.014, 0, 2, 0),
    ("O=C=O", "CO2", 44.009, 0, 2, 0),
    ("[Na+].[Cl-]", "ClNa", 58.44, 0, 0, 0),     # two components
    ("CS(=O)C", "C2H6OS", 78.129, 0, 1, 0),      # hypervalent S(IV)
    ("C1CCCCC1", "C6H12", 84.162, 0, 0, 1),
    ("c1ccc2ccccc2c1", "C10H8", 128.174, 0, 0, 2),  # fused rings
    ("NCCc1ccc(O)c(O)c1", "C8H11NO2", 153.181, 3, 3, 1),  # dopamine
]


@pytest.mark.parametrize("smi,formula,mw,hbd,hba,rings", KNOWN)
def test_known_molecules(smi, formula, mw, hbd, hba, rings):
    d = smiles_descriptors(smi)
    assert d is not None, smi
    assert d["formula"] == formula
    assert d["mol_weight"] == pytest.approx(mw, abs=1e-3)
    assert d["num_h_donors"] == hbd
    assert d["num_h_acceptors"] == hba
    assert d["ring_count"] == rings


@pytest.mark.parametrize(
    "bad",
    ["", "C1CC", "Cl(", "Xx", "C(", "C)", "[Qq]", "C%1", "C=", "C..C",
     "1CC", "[C", "C=#C"],
)
def test_invalid_smiles(bad):
    assert smiles_descriptors(bad) is None


def test_isotope_and_charge():
    d = smiles_descriptors("[13CH4]")  # mass-number approximation
    assert d["mol_weight"] == pytest.approx(13 + 4 * 1.008, abs=1e-3)
    assert smiles_descriptors("[NH4+]")["net_charge"] == 1
    assert smiles_descriptors("[O-]S(=O)(=O)[O-]")["net_charge"] == -2


def test_percent_ring_closure():
    # %10 two-digit ring bond closes the same ring as a digit label
    assert (
        smiles_descriptors("C%10CCCCC%10")["formula"]
        == smiles_descriptors("C1CCCCC1")["formula"]
    )


def test_hill_formula_no_carbon():
    # no carbon -> fully alphabetical including H
    assert hill_formula({"N": 1}, 3) == "H3N"
    assert hill_formula({"S": 1, "O": 4}, 0) == "O4S"


def test_parse_exposes_structure():
    p = parse_smiles("c1ccccc1")
    assert len(p["atoms"]) == 6
    assert len(p["bonds"]) == 6
    assert p["n_rings"] == 1
    assert all(a["aromatic"] for a in p["atoms"])


def test_spark_verb(spark):
    df = spark.createDataFrame(
        [(1, "CCO"), (2, "not a smiles"), (3, None)], "id int, smiles string"
    )
    out = pj.smiles_descriptors(df, "smiles").orderBy("id").collect()
    assert out[0]["mol_formula"] == "C2H6O"
    assert out[0]["mol_mol_weight"] == pytest.approx(46.069, abs=1e-3)
    assert out[1]["mol_formula"] is None  # invalid -> all-null row
    assert out[2]["mol_formula"] is None  # null in -> null out


def test_spark_formula_weight_verbs(spark):
    df = spark.createDataFrame([(1, "O=C=O")], "id int, smiles string")
    f = pj.molecular_formula(df, "smiles").collect()[0]
    assert f["formula"] == "CO2"
    w = pj.molecular_weight(df, "smiles").collect()[0]
    assert w["mol_weight"] == pytest.approx(44.009, abs=1e-3)
    # original columns preserved, one new column appended
    assert pj.molecular_formula(df, "smiles").columns == ["id", "smiles", "formula"]


def test_rdkit_verbs_still_gated(spark):
    df = spark.createDataFrame([(1, "CCO")], "id int, smiles string")
    with pytest.raises(ImportError, match="rdkit"):
        pj.smiles2mol(df, "smiles")
    with pytest.raises(ImportError, match="rdkit"):
        pj.morgan_fingerprint(df, "smiles")
