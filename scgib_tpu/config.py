"""Typed configuration tree — the replacement for the reference's 12
duplicated argparse flag sets (exp_pretraining.py:359-403 etc.,
README.md:74-98).

Defaults follow the paper's Table 10 / the reference CLI defaults: batch
128, hidden 64, d_transfer 32, GIN encoder with 4 conv layers (the
reference hardcodes ``num_layers=5`` and builds ``num_layers-1`` convs,
models.py:57-64), sum readout, useAtt on, recons 'adj', k_transition 1,
pretrain Adam lr 1e-4 / wd 5e-5, fine-tune lr 1e-3 / wd 1e-5, early-stop
patience 50, domain-adapt patience 20.

``DATASETS`` is the per-dataset fine-tune matrix of SURVEY.md §2.2: task
type, loss, metric, selection direction, output count, and the hardcoded
split sizes from molecules.py:211-343.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    in_dim: int = 9
    hidden: int = 64
    d_transfer: int = 32
    encoder: str = "GIN"            # GIN | GCN | GraphSAGE | Transformer
    num_layers: int = 4             # conv count (reference num_layers-1)
    num_heads: int = 8
    readout: str = "sum"            # 'sum' | 's2s'
    use_att: bool = True
    recons_type: str = "adj"        # 'adj' | 'logM'
    kl_mode: str = "corrected"      # 'corrected' | 'reference'
    k_transition: int = 1


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    weight_decay: float = 5e-5
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    model: ModelConfig = ModelConfig()
    optim: OptimConfig = OptimConfig(lr=1e-4, weight_decay=5e-5)
    batch_size: int = 128           # graphs per global batch
    epochs: int = 100               # --pt_epoches default
    patience: int = 50              # early stop on best train loss
    seed: int = 42


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    model: ModelConfig = ModelConfig()
    optim: OptimConfig = OptimConfig(lr=1e-3, weight_decay=1e-5)
    batch_size: int = 128
    epochs: int = 50                # --ft_epoches default
    patience: int = 50
    freeze_mode: str = "reference"  # see trainer.finetune_trainable_mask
    grad_accum: int = 1             # peptides-func uses 2
    wallclock_hours: float = 48.0   # reference 48h cap
    seed: int = 41


@dataclasses.dataclass(frozen=True)
class DomainAdaptConfig:
    optim: OptimConfig = OptimConfig(lr=1e-3, weight_decay=1e-5)
    epochs: int = 50                # --adapt_epoches
    patience: int = 20


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """One fine-tune dataset's task wiring (SURVEY.md §2.2)."""

    name: str
    task: str                       # 'classification' | 'regression'
    num_tasks: int
    loss: str                       # trainer loss_type
    metric: str                     # 'rocauc' | 'ap' | 'rmse' | 'mae' | 'acc'
    select: str                     # 'max' | 'min' on validation metric
    regression_head: bool           # True -> no sigmoid (models.py:384)
    nan_mask: Optional[str] = None  # MetricWrapper mode for NaN labels
    # (train, val) sizes of the hardcoded index split; the remainder is
    # test (molecules.py:211-343).  None -> ratio split 8/1/1.
    split: Optional[Tuple[int, int]] = None
    feat_dim: int = 9
    repeats: int = 1                # TUDataset fine-tunes 3x


DATASETS = {
    # exp_moleculenetBACE_BBBP.py / train_moleculenetBACE.py
    "BACE": DatasetSpec("BACE", "classification", 1, "bce", "rocauc",
                        "max", False, split=(900, 300)),
    "BBBP": DatasetSpec("BBBP", "classification", 1, "bce", "rocauc",
                        "max", False, split=(1200, 400)),
    # exp_moleculeSTCT.py / train_molsider.py (multi-task)
    "Tox21": DatasetSpec("Tox21", "classification", 12, "bce", "rocauc",
                         "max", False, nan_mask="ignore-flatten",
                         split=(4800, 1600)),
    "ToxCast": DatasetSpec("ToxCast", "classification", 617, "bce",
                           "rocauc", "max", False,
                           nan_mask="ignore-flatten", split=(5200, 1700)),
    "SIDER": DatasetSpec("SIDER", "classification", 27, "bce", "rocauc",
                         "max", False, split=(900, 250)),
    "ClinTox": DatasetSpec("ClinTox", "classification", 2, "bce", "rocauc",
                           "max", False, split=(900, 250)),
    "MUV": DatasetSpec("MUV", "classification", 17, "bce", "rocauc",
                       "max", False, nan_mask="ignore-flatten",
                       split=(55000, 18000)),
    # exp_molhiv.py
    "ogbg-molhiv": DatasetSpec("ogbg-molhiv", "classification", 1, "bce",
                               "rocauc", "max", False, split=(26000, 7000)),
    # exp_molsolv.py (regression, RMSE)
    "FreeSolv": DatasetSpec("FreeSolv", "regression", 1, "rmse", "rmse",
                            "min", True, split=(300, 150)),
    "ESOL": DatasetSpec("ESOL", "regression", 1, "rmse", "rmse", "min",
                        True, split=(700, 200)),
    "Lipo": DatasetSpec("Lipo", "regression", 1, "rmse", "rmse", "min",
                        False, split=(2500, 800)),
    # exp_tudataset.py (CE on sigmoided logits, accuracy, 3 repeats)
    "Mutagenicity": DatasetSpec("Mutagenicity", "classification", 2, "ce",
                                "acc", "max", False, split=(3000, 500),
                                feat_dim=14, repeats=3),
    "NCI1": DatasetSpec("NCI1", "classification", 2, "ce", "acc", "max",
                        False, split=(2500, 700), feat_dim=37, repeats=3),
    "NCI109": DatasetSpec("NCI109", "classification", 2, "ce", "acc",
                          "max", False, split=(2500, 700), feat_dim=38,
                          repeats=3),
    # LRGB peptides (exp_pep_func_5.py / exp_pep_struct_5.py)
    "Peptides-func": DatasetSpec("Peptides-func", "classification", 10,
                                 "bce", "ap", "max", False,
                                 nan_mask="ignore-flatten",
                                 split=(10000, 2200)),
    "Peptides-struct": DatasetSpec("Peptides-struct", "regression", 11,
                                   "mae", "mae", "min", True,
                                   split=(10000, 2200)),
    # exp_pcqm4mv2.py / exp_qm9.py / exp_molpcba.py fine-tune paths
    "PCQM4Mv2": DatasetSpec("PCQM4Mv2", "regression", 1, "mae", "mae",
                            "min", True, split=(80000, 10000)),
    "QM9": DatasetSpec("QM9", "regression", 19, "mae", "mae", "min", True,
                       split=(80000, 10000), feat_dim=11),
    "mol-PCBA": DatasetSpec("mol-PCBA", "classification", 128, "bce",
                            "ap", "max", False, nan_mask="ignore-flatten",
                            split=(350000, 43000)),
}

# The 3-stage pretraining curriculum (exp_pretraining.py:218-219)
PRETRAIN_STAGES = (("PCQM4Mv2", 9), ("QM9", 11), ("mol-PCBA", 9))

# Datasets whose fine-tune head skips the sigmoid (models.py:384)
REGRESSION_HEAD_DATASETS = ("ZINC", "Peptides-struct", "FreeSolv", "ESOL")
