"""Minimal pure-Python SMILES parser for the chemistry fallback.

The reference chemistry pack (ref ``janitor/chemistry.py:81-424``) leans
on rdkit for every computation; rdkit is not bundled in this
environment, which left the pack import-gated and never executed.  This
module implements enough of the public Daylight/OpenSMILES
specification to compute the *topological* descriptors — molecular
formula, molecular weight, Lipinski H-bond donors/acceptors, ring
count, heavy-atom count — without rdkit.  Fragment-contribution
descriptors (LogP, TPSA) genuinely require rdkit's parameter tables and
stay gated.

Implicit-hydrogen model (OpenSMILES §3.1.5 "implicit hydrogens"):

* aliphatic organic-subset atoms get the smallest normal valence that
  covers the explicit bond-order sum; leftover valence becomes H.
* aromatic (lowercase) atoms consume one valence unit in the pi system:
  ``H = max(0, lowest_valence - (degree + 1))`` with aromatic bonds
  counted as single.  This reproduces the spec's worked examples —
  benzene ``c`` -> 1H, pyridine ``n`` -> 0H, pyrrole requires ``[nH]``,
  thiophene ``s`` -> 0H, N-methylated aromatic ``n(C)`` -> 0H.
* bracket atoms carry exactly the hydrogen count written (default 0).

Everything here derives from the public SMILES grammar and IUPAC 2021
standard atomic weights; no chemistry toolkit is consulted.
"""

from __future__ import annotations

import math
import re
from typing import Optional

__all__ = ["parse_smiles", "smiles_descriptors", "hill_formula"]

# IUPAC 2021 standard atomic weights (abridged to common elements).
ATOMIC_WEIGHTS = {
    "H": 1.008, "He": 4.003, "Li": 6.94, "Be": 9.012, "B": 10.81,
    "C": 12.011, "N": 14.007, "O": 15.999, "F": 18.998, "Ne": 20.180,
    "Na": 22.990, "Mg": 24.305, "Al": 26.982, "Si": 28.085, "P": 30.974,
    "S": 32.06, "Cl": 35.45, "Ar": 39.95, "K": 39.098, "Ca": 40.078,
    "Ti": 47.867, "V": 50.942, "Cr": 51.996, "Mn": 54.938, "Fe": 55.845,
    "Co": 58.933, "Ni": 58.693, "Cu": 63.546, "Zn": 65.38, "Ga": 69.723,
    "Ge": 72.630, "As": 74.922, "Se": 78.971, "Br": 79.904, "Kr": 83.798,
    "Rb": 85.468, "Sr": 87.62, "Mo": 95.95, "Pd": 106.42, "Ag": 107.868,
    "Cd": 112.414, "Sn": 118.71, "Sb": 121.760, "Te": 127.60,
    "I": 126.904, "Cs": 132.905, "Ba": 137.327, "W": 183.84,
    "Pt": 195.084, "Au": 196.967, "Hg": 200.592, "Tl": 204.38,
    "Pb": 207.2, "Bi": 208.980,
}

# Daylight "normal valences" used for implicit-H resolution.
DEFAULT_VALENCES = {
    "B": (3,), "C": (4,), "N": (3, 5), "O": (2,), "P": (3, 5),
    "S": (2, 4, 6), "F": (1,), "Cl": (1,), "Br": (1,), "I": (1,),
}

# Organic subset: atoms writable without brackets.  Two-letter symbols
# must be matched before one-letter ones.
_ORGANIC = ("Br", "Cl", "B", "C", "N", "O", "P", "S", "F", "I")
_AROMATIC_ORGANIC = ("b", "c", "n", "o", "p", "s")
# Aromatic symbols legal inside brackets (OpenSMILES adds se/as).
_AROMATIC_BRACKET = {"b", "c", "n", "o", "p", "s", "se", "as"}

_BOND_ORDERS = {"-": 1.0, "=": 2.0, "#": 3.0, "$": 4.0, ":": 1.0,
                "/": 1.0, "\\": 1.0}

_BRACKET_RE = re.compile(
    r"\[(?P<iso>\d+)?(?P<elem>[A-Z][a-z]?|[a-z][a-z]?|\*)"
    r"(?P<chi>@@?|@TH[12]|@AL[12]|@SP[1-3]|@TB\d{1,2}|@OH\d{1,2})?"
    r"(?P<h>H\d*)?(?P<chg>\+{1,3}|-{1,3}|[+-]\d+)?(?::\d+)?\]"
)


def parse_smiles(s: str) -> Optional[dict]:
    """Parse a SMILES string into atoms/bonds, or None if malformed.

    Returns ``{"atoms": [...], "bonds": [...], "n_components": int,
    "n_rings": int}`` where each atom is ``{"elem", "aromatic", "h",
    "charge", "iso"}`` (``h`` is None for to-be-derived organic-subset
    atoms) and each bond is ``(i, j, order)``.
    """
    if not s or not isinstance(s, str):
        return None
    atoms: list[dict] = []
    bonds: list[tuple[int, int, float]] = []
    stack: list[Optional[int]] = []
    ring_open: dict[str, tuple[int, Optional[float]]] = {}
    prev: Optional[int] = None
    pending: Optional[float] = None  # explicit bond symbol awaiting use
    i, n = 0, len(s)

    def add_atom(elem: str, aromatic: bool, h, charge: int, iso) -> bool:
        nonlocal prev, pending
        atoms.append(
            {"elem": elem, "aromatic": aromatic, "h": h, "charge": charge,
             "iso": iso}
        )
        idx = len(atoms) - 1
        if prev is not None:
            order = pending
            if order is None:
                order = 1.0
            bonds.append((prev, idx, order))
        prev = idx
        pending = None
        return True

    while i < n:
        ch = s[i]
        if ch == "[":
            m = _BRACKET_RE.match(s, i)
            if not m:
                return None
            elem = m.group("elem")
            aromatic = elem.islower()
            if aromatic and elem not in _AROMATIC_BRACKET:
                return None
            elem_norm = elem.capitalize() if elem != "*" else "*"
            if elem_norm != "*" and elem_norm not in ATOMIC_WEIGHTS:
                return None
            htok = m.group("h")
            h = 0 if htok is None else (1 if htok == "H" else int(htok[1:]))
            ctok = m.group("chg")
            if ctok is None:
                charge = 0
            elif set(ctok) <= {"+"}:
                charge = len(ctok)
            elif set(ctok) <= {"-"}:
                charge = -len(ctok)
            else:
                charge = int(ctok)
            iso = int(m.group("iso")) if m.group("iso") else None
            add_atom(elem_norm, aromatic, h, charge, iso)
            i = m.end()
        elif s.startswith(("Cl", "Br"), i):
            add_atom(s[i : i + 2], False, None, 0, None)
            i += 2
        elif ch in "BCNOPSFI":
            add_atom(ch, False, None, 0, None)
            i += 1
        elif ch in "bcnops":
            add_atom(ch.upper(), True, None, 0, None)
            i += 1
        elif ch in _BOND_ORDERS:
            if pending is not None:
                return None
            pending = _BOND_ORDERS[ch]
            i += 1
        elif ch == "(":
            if prev is None:
                return None
            stack.append(prev)
            i += 1
        elif ch == ")":
            if not stack:
                return None
            prev = stack.pop()
            i += 1
        elif ch.isdigit() or ch == "%":
            if prev is None:
                return None
            if ch == "%":
                if i + 2 >= n or not s[i + 1 : i + 3].isdigit():
                    return None
                label, i = s[i + 1 : i + 3], i + 3
            else:
                label, i = ch, i + 1
            if label in ring_open:
                j, open_order = ring_open.pop(label)
                order = pending if pending is not None else open_order
                if order is None:
                    order = 1.0
                if j == prev:
                    return None
                bonds.append((j, prev, order))
                pending = None
            else:
                ring_open[label] = (prev, pending)
                pending = None
        elif ch == ".":
            # a dot must separate two non-empty components: reject a
            # leading dot, consecutive dots, and a dot after '('
            if pending is not None or prev is None:
                return None
            prev = None
            i += 1
        else:
            return None
    # prev is None at the end only after a trailing dot
    if ring_open or stack or pending is not None or not atoms or prev is None:
        return None
    # components from the actual bond graph (union-find), so the
    # cyclomatic ring count is robust to how dots were written
    parent = list(range(len(atoms)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in bonds:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    n_components = len({find(x) for x in range(len(atoms))})
    return {
        "atoms": atoms,
        "bonds": bonds,
        "n_components": n_components,
        "n_rings": len(bonds) - (len(atoms) - n_components),
    }


def _implicit_h(atom: dict, degree_sum: float, aromatic_atom: bool) -> int:
    if atom["h"] is not None:  # bracket atom: exactly as written
        return atom["h"]
    valences = DEFAULT_VALENCES.get(atom["elem"])
    if valences is None:
        return 0
    if aromatic_atom:
        # one valence unit is consumed by the aromatic pi system; no
        # promotion to hypervalent states for aromatic atoms
        return max(0, valences[0] - (int(math.ceil(degree_sum)) + 1))
    need = int(math.ceil(degree_sum))
    for v in valences:
        if v >= need:
            return v - need
    return 0


def smiles_descriptors(s: str) -> Optional[dict]:
    """Topological descriptors of one SMILES string (None if invalid).

    Keys: formula, mol_weight, num_h_donors, num_h_acceptors,
    ring_count, heavy_atoms, net_charge, total_h.
    """
    p = parse_smiles(s)
    if p is None or p["n_rings"] < 0:
        return None
    atoms, bonds = p["atoms"], p["bonds"]
    if any(a["elem"] == "*" for a in atoms):
        return None  # wildcard atoms have no mass or formula
    deg = [0.0] * len(atoms)
    for a, b, order in bonds:
        deg[a] += order
        deg[b] += order
    h_counts = [
        _implicit_h(a, deg[i], a["aromatic"]) for i, a in enumerate(atoms)
    ]
    elem_counts: dict[str, int] = {}
    weight = 0.0
    total_h = 0
    donors = acceptors = heavy = 0
    for a, h in zip(atoms, h_counts):
        elem = a["elem"]
        elem_counts[elem] = elem_counts.get(elem, 0) + 1
        # isotope mass-number approximation, documented: [13C] -> 13.0
        weight += float(a["iso"]) if a["iso"] else ATOMIC_WEIGHTS[elem]
        weight += h * ATOMIC_WEIGHTS["H"]
        total_h += h
        if elem != "H":
            heavy += 1
        if elem in ("N", "O"):
            acceptors += 1  # Lipinski acceptor = any N or O
            if h >= 1:
                donors += 1  # Lipinski donor = N-H or O-H
    # explicit [H] atoms fold into the hydrogen tally, not heavy atoms
    explicit_h = elem_counts.pop("H", 0)
    total_h += explicit_h
    return {
        "formula": hill_formula(elem_counts, total_h),
        "mol_weight": weight,
        "num_h_donors": donors,
        "num_h_acceptors": acceptors,
        "ring_count": p["n_rings"],
        "heavy_atoms": heavy,
        "net_charge": sum(a["charge"] for a in atoms),
        "total_h": total_h,
    }


def hill_formula(elem_counts: dict, total_h: int) -> str:
    """Hill-order molecular formula: C, H, then alphabetical (all
    alphabetical including H when no carbon is present)."""
    counts = dict(elem_counts)
    parts: list[str] = []

    def fmt(e: str, c: int) -> str:
        return f"{e}{c if c > 1 else ''}"

    if "C" in counts:
        parts.append(fmt("C", counts.pop("C")))
        if total_h:
            parts.append(fmt("H", total_h))
        parts.extend(fmt(e, counts[e]) for e in sorted(counts))
    else:
        if total_h:
            counts["H"] = counts.get("H", 0) + total_h
        parts.extend(fmt(e, counts[e]) for e in sorted(counts))
    return "".join(parts)
