"""Featurizer golden vectors — hand-derived RDKit/OGB ground truth.

Pins ``data/smiles.py`` atom featurization to the EXACT output of
``ogb.utils.features.atom_to_feature_vector`` (the representation the
reference consumes for PCQM4Mv2/molhiv/molpcba via util.py:277-325) for a
set of molecules covering: alkane/alkene/alkyne/nitrile carbons, water/
alcohol/carbonyl/carboxyl oxygens, amines, aromatics (benzene, pyridine,
pyrrole, furan, thiophene, fused naphthalene, charged pyridinium),
saturated rings, formal charges (ammonium, alkoxide, quaternary N, nitro),
halogens, hypervalent S/P (sulfone, sulfonamide, phosphate — the BACE/
Tox21 chemistry where hybridization is easy to get wrong), thioethers,
stereo tags, isotopes, and disconnected salts.

Every expected vector was derived BY HAND from the RDKit semantics OGB
wraps (not by running this repo's code):
  [atomic_num-1, chirality_idx, total_degree_incl_H, formal_charge+5,
   num_H, num_radical_electrons, hybridization(SP=0,SP2=1,SP3=2,SP3D=3,
   SP3D2=4,misc=5), is_aromatic, is_in_ring]
Hybridization follows RDKit's steric-number rule (sigma degree + lone
pairs; aromatic atoms SP2), e.g. sulfone S = SP3 (4 sigma, 0 lp), nitrile
N = SP (1 sigma + 1 lp), isolated ions = 'S' -> OGB 'misc'.
"""

import numpy as np
import pytest

from scgib_tpu.data.smiles import (atom_features_ogb, atom_features_pyg,
                                   bond_features_ogb, parse_smiles)

C = lambda deg, nh, hyb, ring=0: [5, 0, deg, 5, nh, 0, hyb, 0, ring]
cAr = lambda nh: [5, 0, 3, 5, nh, 0, 1, 1, 1]   # aromatic ring carbon

GOLDENS = {
    # --- carbons across bond orders -----------------------------------
    "C": [[5, 0, 4, 5, 4, 0, 2, 0, 0]],
    "CC": [C(4, 3, 2)] * 2,
    "CCO": [C(4, 3, 2), C(4, 2, 2), [7, 0, 2, 5, 1, 0, 2, 0, 0]],
    "C=C": [C(3, 2, 1)] * 2,
    "C#C": [C(2, 1, 0)] * 2,
    "C#N": [C(2, 1, 0), [6, 0, 1, 5, 0, 0, 0, 0, 0]],
    "CC#N": [C(4, 3, 2), C(2, 0, 0), [6, 0, 1, 5, 0, 0, 0, 0, 0]],
    "C=C=C": [C(3, 2, 1), C(2, 0, 0), C(3, 2, 1)],   # allene center SP
    # --- oxygens -------------------------------------------------------
    "O": [[7, 0, 2, 5, 2, 0, 2, 0, 0]],
    "C=O": [C(3, 2, 1), [7, 0, 1, 5, 0, 0, 1, 0, 0]],
    "CC(=O)C": [C(4, 3, 2), C(3, 0, 1), [7, 0, 1, 5, 0, 0, 1, 0, 0],
                C(4, 3, 2)],
    "CC(=O)O": [C(4, 3, 2), C(3, 0, 1), [7, 0, 1, 5, 0, 0, 1, 0, 0],
                [7, 0, 2, 5, 1, 0, 1, 0, 0]],   # OH oxygen conjugated: SP2
    # --- nitrogens -----------------------------------------------------
    "N": [[6, 0, 3, 5, 3, 0, 2, 0, 0]],
    "CN": [C(4, 3, 2), [6, 0, 3, 5, 2, 0, 2, 0, 0]],
    # --- aromatics -----------------------------------------------------
    "c1ccccc1": [cAr(1)] * 6,
    "Cc1ccccc1": [C(4, 3, 2), cAr(0)] + [cAr(1)] * 5,
    "c1ccncc1": [cAr(1), cAr(1), cAr(1),
                 [6, 0, 2, 5, 0, 0, 1, 1, 1], cAr(1), cAr(1)],
    "c1cc[nH]c1": [cAr(1), cAr(1), cAr(1),
                   [6, 0, 3, 5, 1, 0, 1, 1, 1], cAr(1)],
    "c1ccoc1": [cAr(1), cAr(1), cAr(1),
                [7, 0, 2, 5, 0, 0, 1, 1, 1], cAr(1)],
    "c1ccsc1": [cAr(1), cAr(1), cAr(1),
                [15, 0, 2, 5, 0, 0, 1, 1, 1], cAr(1)],
    "c1ccc2ccccc2c1": [cAr(1), cAr(1), cAr(1), cAr(0), cAr(1), cAr(1),
                       cAr(1), cAr(1), cAr(0), cAr(1)],
    "c1cc[nH+]cc1": [cAr(1), cAr(1), cAr(1),
                     [6, 0, 3, 6, 1, 0, 1, 1, 1], cAr(1), cAr(1)],
    # --- saturated rings -------------------------------------------------
    "C1CC1": [C(4, 2, 2, ring=1)] * 3,
    "C1CCCCC1": [C(4, 2, 2, ring=1)] * 6,
    # --- formal charges --------------------------------------------------
    "[NH4+]": [[6, 0, 4, 6, 4, 0, 2, 0, 0]],
    "C[O-]": [C(4, 3, 2), [7, 0, 1, 4, 0, 0, 2, 0, 0]],
    "C[N+](C)(C)C": [C(4, 3, 2), [6, 0, 4, 6, 0, 0, 2, 0, 0],
                     C(4, 3, 2), C(4, 3, 2), C(4, 3, 2)],
    "C[N+](=O)[O-]": [C(4, 3, 2), [6, 0, 3, 6, 0, 0, 1, 0, 0],
                      [7, 0, 1, 5, 0, 0, 1, 0, 0],
                      [7, 0, 1, 4, 0, 0, 1, 0, 0]],  # O^- conjugated: SP2
    # --- halogens --------------------------------------------------------
    "CF": [C(4, 3, 2), [8, 0, 1, 5, 0, 0, 2, 0, 0]],
    "CCl": [C(4, 3, 2), [16, 0, 1, 5, 0, 0, 2, 0, 0]],
    "CBr": [C(4, 3, 2), [34, 0, 1, 5, 0, 0, 2, 0, 0]],
    "CI": [C(4, 3, 2), [52, 0, 1, 5, 0, 0, 2, 0, 0]],
    "FC(F)(F)F": [[8, 0, 1, 5, 0, 0, 2, 0, 0], C(4, 0, 2),
                  [8, 0, 1, 5, 0, 0, 2, 0, 0], [8, 0, 1, 5, 0, 0, 2, 0, 0],
                  [8, 0, 1, 5, 0, 0, 2, 0, 0]],
    # --- hypervalent S / P (BACE & Tox21 chemistry) ----------------------
    "CS(=O)(=O)C": [C(4, 3, 2), [15, 0, 4, 5, 0, 0, 2, 0, 0],
                    [7, 0, 1, 5, 0, 0, 1, 0, 0],
                    [7, 0, 1, 5, 0, 0, 1, 0, 0], C(4, 3, 2)],
    "CS(=O)(=O)N": [C(4, 3, 2), [15, 0, 4, 5, 0, 0, 2, 0, 0],
                    [7, 0, 1, 5, 0, 0, 1, 0, 0],
                    [7, 0, 1, 5, 0, 0, 1, 0, 0],
                    [6, 0, 3, 5, 2, 0, 2, 0, 0]],
    "OP(=O)(O)O": [[7, 0, 2, 5, 1, 0, 2, 0, 0],
                   [14, 0, 4, 5, 0, 0, 2, 0, 0],
                   [7, 0, 1, 5, 0, 0, 1, 0, 0],
                   [7, 0, 2, 5, 1, 0, 2, 0, 0],
                   [7, 0, 2, 5, 1, 0, 2, 0, 0]],
    "CSC": [C(4, 3, 2), [15, 0, 2, 5, 0, 0, 2, 0, 0], C(4, 3, 2)],
    "CS": [C(4, 3, 2), [15, 0, 2, 5, 1, 0, 2, 0, 0]],
    "C=S": [C(3, 2, 1), [15, 0, 1, 5, 0, 0, 1, 0, 0]],
    "FS(F)(F)(F)(F)F": [[8, 0, 1, 5, 0, 0, 2, 0, 0],
                        [15, 0, 6, 5, 0, 0, 4, 0, 0]] +
                       [[8, 0, 1, 5, 0, 0, 2, 0, 0]] * 5,
    # --- stereo tags ------------------------------------------------------
    # '@' -> CHI_TETRAHEDRAL_CCW (idx 2), '@@' -> CW (idx 1)
    "C[C@H](N)C(=O)O": [C(4, 3, 2), [5, 2, 4, 5, 1, 0, 2, 0, 0],
                        [6, 0, 3, 5, 2, 0, 2, 0, 0], C(3, 0, 1),
                        [7, 0, 1, 5, 0, 0, 1, 0, 0],
                        [7, 0, 2, 5, 1, 0, 1, 0, 0]],  # carboxyl OH SP2
    "C[C@@H](N)C(=O)O": [C(4, 3, 2), [5, 1, 4, 5, 1, 0, 2, 0, 0],
                         [6, 0, 3, 5, 2, 0, 2, 0, 0], C(3, 0, 1),
                         [7, 0, 1, 5, 0, 0, 1, 0, 0],
                         [7, 0, 2, 5, 1, 0, 1, 0, 0]],  # carboxyl OH SP2
    # --- conjugation-aware hybridization + kekulized-notation aromaticity
    # (VERDICT round-2 item 4).  Each vector hand-checked against RDKit
    # semantics: amide/aniline/guanidine N, ester/phenol/anisole O -> SP2;
    # kekulized benzene/pyridine/pyrrole/naphthalene perceived aromatic
    # with unchanged H counts; quinone NOT aromatic (exocyclic C=O
    # contributes 0 pi electrons); thioanisole S and phenylphosphine P
    # stay SP3 (first-row-only conjugation candidates, the Issue211
    # behavior); cyclohexene stays non-aromatic.
    "CC(N)=O": [[5, 0, 4, 5, 3, 0, 2, 0, 0], [5, 0, 3, 5, 0, 0, 1, 0, 0], [6, 0, 3, 5, 2, 0, 1, 0, 0], [7, 0, 1, 5, 0, 0, 1, 0, 0]],
    "Nc1ccccc1": [[6, 0, 3, 5, 2, 0, 1, 0, 0], [5, 0, 3, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
    "CC(=O)OC": [[5, 0, 4, 5, 3, 0, 2, 0, 0], [5, 0, 3, 5, 0, 0, 1, 0, 0], [7, 0, 1, 5, 0, 0, 1, 0, 0], [7, 0, 2, 5, 0, 0, 1, 0, 0], [5, 0, 4, 5, 3, 0, 2, 0, 0]],
    "Oc1ccccc1": [[7, 0, 2, 5, 1, 0, 1, 0, 0], [5, 0, 3, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
    "COc1ccccc1": [[5, 0, 4, 5, 3, 0, 2, 0, 0], [7, 0, 2, 5, 0, 0, 1, 0, 0], [5, 0, 3, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
    "C1=CC=CC=C1": [[5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
    "C1=CC=NC=C1": [[5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [6, 0, 2, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
    "C1=CC=CN1": [[5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [6, 0, 3, 5, 1, 0, 1, 1, 1]],
    "O=C1C=CC(=O)C=C1": [[7, 0, 1, 5, 0, 0, 1, 0, 0], [5, 0, 3, 5, 0, 0, 1, 0, 1], [5, 0, 3, 5, 1, 0, 1, 0, 1], [5, 0, 3, 5, 1, 0, 1, 0, 1], [5, 0, 3, 5, 0, 0, 1, 0, 1], [7, 0, 1, 5, 0, 0, 1, 0, 0], [5, 0, 3, 5, 1, 0, 1, 0, 1], [5, 0, 3, 5, 1, 0, 1, 0, 1]],
    "CSc1ccccc1": [[5, 0, 4, 5, 3, 0, 2, 0, 0], [15, 0, 2, 5, 0, 0, 2, 0, 0], [5, 0, 3, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
    "Pc1ccccc1": [[14, 0, 3, 5, 2, 0, 2, 0, 0], [5, 0, 3, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
    "NC(=N)N": [[6, 0, 3, 5, 2, 0, 1, 0, 0], [5, 0, 3, 5, 0, 0, 1, 0, 0], [6, 0, 2, 5, 1, 0, 1, 0, 0], [6, 0, 3, 5, 2, 0, 1, 0, 0]],
    "C1=CC2=CC=CC=C2C=C1": [[5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 0, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1], [5, 0, 3, 5, 1, 0, 1, 1, 1]],
    "C1=CCCCC1": [[5, 0, 3, 5, 1, 0, 1, 0, 1], [5, 0, 3, 5, 1, 0, 1, 0, 1], [5, 0, 4, 5, 2, 0, 2, 0, 1], [5, 0, 4, 5, 2, 0, 2, 0, 1], [5, 0, 4, 5, 2, 0, 2, 0, 1], [5, 0, 4, 5, 2, 0, 2, 0, 1]],
    # --- isotopes (OGB keys on atomic number only) ------------------------
    "[13CH4]": [[5, 0, 4, 5, 4, 0, 2, 0, 0]],
    # --- disconnected salt: isolated ions hybridize 'S' -> OGB 'misc' -----
    "[Na+].[Cl-]": [[10, 0, 0, 6, 0, 0, 5, 0, 0],
                    [16, 0, 0, 4, 0, 0, 5, 0, 0]],
}


@pytest.mark.parametrize("smiles", sorted(GOLDENS))
def test_ogb_atom_features_golden(smiles):
    mol = parse_smiles(smiles)
    got = [atom_features_ogb(a) for a in mol.atoms]
    assert got == GOLDENS[smiles], (
        f"{smiles}: got {got}, want {GOLDENS[smiles]}")


def test_pyg_scheme_spot_checks():
    """PyG x_map uses raw values (Z, degree, charge+5 clamped, numH) and
    its own hybridization list with UNSPECIFIED/S/OTHER slots."""
    # benzene carbon: [Z, chi, deg, charge_idx, numH, rad, hyb, arom, ring]
    a = parse_smiles("c1ccccc1").atoms[0]
    assert atom_features_pyg(a) == [6, 0, 3, 5, 1, 0, 3, 1, 1]  # SP2 -> 3
    # methane: SP3 -> 4
    a = parse_smiles("C").atoms[0]
    assert atom_features_pyg(a) == [6, 0, 4, 5, 4, 0, 4, 0, 0]
    # isolated cation: 'S' hybridization is index 1 in the PyG list
    a = parse_smiles("[Na+]").atoms[0]
    assert atom_features_pyg(a) == [11, 0, 0, 6, 0, 0, 1, 0, 0]


def test_ogb_bond_features_golden():
    """[type(S0/D1/T2/A3/misc4), stereo(0), conjugated]."""
    mol = parse_smiles("C=CC#Cc1ccccc1")
    # bond orders: double, single, triple, single, 6 aromatic ring bonds
    types = [bond_features_ogb(b)[0] for b in mol.bonds]
    assert types[:4] == [1, 0, 2, 0]
    assert all(t == 3 for t in types[4:10])
    arom = parse_smiles("c1ccccc1").bonds[0]
    assert bond_features_ogb(arom) == [3, 0, 1]


def test_golden_corpus_size():
    """Keep the corpus honest: at least 40 molecules / 150 atoms pinned."""
    n_mol = len(GOLDENS)
    n_atoms = sum(len(v) for v in GOLDENS.values())
    assert n_mol >= 40 and n_atoms >= 120, (n_mol, n_atoms)
