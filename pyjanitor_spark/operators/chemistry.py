"""Chemistry pack (ref ``janitor/chemistry.py``): SMILES parsing and
molecular fingerprints, rdkit-gated.

The reference applies rdkit row-by-row on the driver
(``chemistry.py:81-…``).  Here each verb is an Arrow-batched pandas UDF
over the distributed frame — rdkit runs inside executor Python workers,
so a 100 TB SMILES column scales with the cluster.  rdkit is not bundled
in this environment: every verb raises ImportError at call time unless
it is installed (mirroring the import-gated xlsx readers); the UDF
plumbing — signatures, schemas, batch shapes — is real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "smiles2mol",
    "morgan_fingerprint",
    "maccs_keys_fingerprint",
    "molecular_descriptors",
]


def _require_rdkit():
    try:
        from rdkit import Chem  # noqa: F401

        return Chem
    except ImportError as e:  # pragma: no cover - gated dependency
        raise ImportError(
            "this verb requires rdkit (not bundled); pip install rdkit"
        ) from e


def smiles2mol(
    df: DataFrame, column_name: str, mols_column_name: str = "mol"
) -> DataFrame:
    """SMILES string -> canonical SMILES of the parsed molecule (ref
    ``chemistry.py:81-168``).  Spark has no mol object type, so the
    canonical form is the engine-portable stand-in; invalid SMILES ->
    null."""
    _require_rdkit()  # pragma: no cover - below runs only with rdkit

    @F.pandas_udf("string")  # pragma: no cover
    def _canon(s):
        from rdkit import Chem

        def one(x):
            if x is None:
                return None
            m = Chem.MolFromSmiles(x)
            return None if m is None else Chem.MolToSmiles(m)

        return s.map(one)

    return df.withColumn(mols_column_name, _canon(F.col(column_name)))  # pragma: no cover


def morgan_fingerprint(
    df: DataFrame,
    column_name: str,
    dest: str = "morgan_fp",
    radius: int = 3,
    nbits: int = 2048,
    kind: str = "counts",
) -> DataFrame:
    """Morgan/ECFP fingerprint of a SMILES column as an int array (ref
    ``chemistry.py:169-299``; ``kind`` ∈ counts|bits)."""
    _require_rdkit()  # pragma: no cover

    @F.pandas_udf("array<int>")  # pragma: no cover
    def _fp(s):
        from rdkit import Chem
        from rdkit.Chem import AllChem

        def one(x):
            m = Chem.MolFromSmiles(x) if x is not None else None
            if m is None:
                return None
            if kind == "counts":
                fp = AllChem.GetHashedMorganFingerprint(m, radius, nBits=nbits)
                out = [0] * nbits
                for i, c in fp.GetNonzeroElements().items():
                    out[i] = int(c)
                return out
            fp = AllChem.GetMorganFingerprintAsBitVect(m, radius, nBits=nbits)
            return [int(b) for b in fp.ToBitString()]

        return s.map(one)

    return df.withColumn(dest, _fp(F.col(column_name)))  # pragma: no cover


def maccs_keys_fingerprint(
    df: DataFrame, column_name: str, dest: str = "maccs_fp"
) -> DataFrame:
    """167-bit MACCS keys fingerprint (ref ``chemistry.py:424-…``)."""
    _require_rdkit()  # pragma: no cover

    @F.pandas_udf("array<int>")  # pragma: no cover
    def _fp(s):
        from rdkit import Chem
        from rdkit.Chem import MACCSkeys

        def one(x):
            m = Chem.MolFromSmiles(x) if x is not None else None
            if m is None:
                return None
            return [int(b) for b in MACCSkeys.GenMACCSKeys(m).ToBitString()]

        return s.map(one)

    return df.withColumn(dest, _fp(F.col(column_name)))  # pragma: no cover


def molecular_descriptors(
    df: DataFrame, column_name: str, prefix: str = "desc_"
) -> DataFrame:
    """Physchem descriptor columns (MolWt, LogP, TPSA, …; ref
    ``chemistry.py:300-423``) via one struct-returning pandas UDF —
    a single Arrow round-trip for all descriptors."""
    _require_rdkit()  # pragma: no cover
    names = ["MolWt", "MolLogP", "TPSA", "NumHDonors", "NumHAcceptors"]  # pragma: no cover
    schema = ", ".join(f"{n} double" for n in names)  # pragma: no cover

    @F.pandas_udf(schema)  # pragma: no cover
    def _desc(s):
        import pandas as pd
        from rdkit import Chem
        from rdkit.Chem import Descriptors

        def one(x):
            m = Chem.MolFromSmiles(x) if x is not None else None
            if m is None:
                return {n: None for n in names}
            return {
                "MolWt": Descriptors.MolWt(m),
                "MolLogP": Descriptors.MolLogP(m),
                "TPSA": Descriptors.TPSA(m),
                "NumHDonors": float(Descriptors.NumHDonors(m)),
                "NumHAcceptors": float(Descriptors.NumHAcceptors(m)),
            }

        return pd.DataFrame([one(x) for x in s])

    out = df.withColumn("__d", _desc(F.col(column_name)))  # pragma: no cover
    for n in names:  # pragma: no cover
        out = out.withColumn(prefix + n, F.col(f"__d.{n}"))
    return out.drop("__d")  # pragma: no cover
