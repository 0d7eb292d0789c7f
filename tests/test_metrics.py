"""Metrics parity vs sklearn (the reference delegates ROC-AUC/AP to sklearn,
metrics.py:10) and behavior checks for the NaN-masking MetricWrapper."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score, roc_auc_score

from scgib_tpu.utils.metrics import (accuracy_tu, average_precision_binary,
                                     eval_acc, eval_ap, eval_rmse,
                                     eval_rocauc, mae, rmse, roc_auc_binary)
from scgib_tpu.utils.metric_wrapper import MetricWrapper


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roc_auc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    y = (rng.random(200) < 0.3).astype(float)
    s = rng.random(200)
    # add ties
    s = np.round(s, 2)
    assert roc_auc_binary(y, s) == pytest.approx(roc_auc_score(y, s),
                                                 abs=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    y = (rng.random(200) < 0.25).astype(float)
    s = np.round(rng.random(200), 2)
    assert average_precision_binary(y, s) == pytest.approx(
        average_precision_score(y, s), abs=1e-12)


def test_eval_rocauc_multitask_nan():
    rng = np.random.default_rng(3)
    y = (rng.random((100, 4)) < 0.4).astype(float)
    y[rng.random((100, 4)) < 0.2] = np.nan
    y[:, 3] = 1.0  # single-class task -> skipped
    s = rng.random((100, 4))
    got = eval_rocauc(y, s)["rocauc"]
    vals = []
    for i in range(3):
        keep = ~np.isnan(y[:, i])
        vals.append(roc_auc_score(y[keep, i], s[keep, i]))
    assert got == pytest.approx(np.mean(vals), abs=1e-12)


def test_eval_rmse_acc():
    y = np.array([[1.0, 2.0], [3.0, np.nan]])
    p = np.array([[1.5, 2.0], [3.0, 9.9]])
    assert eval_rmse(y, p)["rmse"] == pytest.approx(
        (np.sqrt(0.125) + 0.0) / 2)
    yt = np.array([[1.0], [0.0], [np.nan]])
    yp = np.array([[1.0], [1.0], [0.0]])
    assert eval_acc(yt, yp)["acc"] == pytest.approx(0.5)


def test_simple_metrics():
    s = np.array([1.0, 2.0, 3.0])
    t = np.array([1.0, 2.5, 2.0])
    assert rmse(s, t) == pytest.approx(np.sqrt(np.mean([0, .25, 1]) + 1e-6))
    assert mae(s, t) == pytest.approx(0.5)
    scores = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    targets = np.array([[1], [0], [0]])
    assert accuracy_tu(scores, targets) == 2.0  # raw count, not normalized


def test_metric_wrapper_modes():
    def mean_abs(p, t):
        return float(np.mean(np.abs(p - t)))

    p = np.array([[1.0, 2.0], [3.0, 4.0]])
    t = np.array([[1.0, np.nan], [2.0, 4.0]])

    # constant fill
    w = MetricWrapper(mean_abs, target_nan_mask=0)
    assert w(p, t) == pytest.approx(np.mean([0, 2, 1, 0]))
    # ignore-flatten
    w = MetricWrapper(mean_abs, target_nan_mask="ignore-flatten")
    assert w(p, t) == pytest.approx(np.mean([0, 1, 0]))
    # ignore-mean-label: column means of [0,1] and [0]
    w = MetricWrapper(mean_abs, target_nan_mask="ignore-mean-label")
    assert w(p, t) == pytest.approx(np.mean([0.5, 0.0]))


def test_metric_wrapper_skips_failing_columns():
    def fussy(p, t):
        if len(t) < 2:
            raise RuntimeError("too few")
        return float(np.mean(p))

    p = np.array([[1.0, 5.0], [3.0, np.nan]])
    t = np.array([[1.0, 0.0], [2.0, np.nan]])
    w = MetricWrapper(fussy, target_nan_mask="ignore-mean-label")
    assert w(p, t) == pytest.approx(2.0)  # column 1 raised -> skipped
