"""Observability: step timers with edges/s counters, JAX profiler traces,
and run logging.

The reference has no tracing or profiling — only wall-clock per-epoch
prints and a 2-line config dump under ``exp_logs/``
(exp_moleculenetBACE_BBBP.py:164-195, SURVEY.md §5).  This module provides
the real thing: the north-star edges/s/chip counter, optional XLA profiler
traces viewable in TensorBoard/Perfetto, and structured run logs.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Any, Dict, Iterator, Optional


class StepTimer:
    """Accumulates step wall-times and work counters; reports edges/s.

    Usage:
        timer = StepTimer()
        with timer.step(edges=n_edges):
            state, loss = train_step(...)
        print(timer.summary())
    """

    def __init__(self):
        self.steps = 0
        self.total_time = 0.0
        self.total_edges = 0
        self.total_nodes = 0
        self.total_graphs = 0

    @contextlib.contextmanager
    def step(self, edges: int = 0, nodes: int = 0,
             graphs: int = 0) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.total_time += time.perf_counter() - t0
        self.steps += 1
        self.total_edges += edges
        self.total_nodes += nodes
        self.total_graphs += graphs

    @property
    def edges_per_s(self) -> float:
        return self.total_edges / self.total_time if self.total_time else 0.0

    @property
    def steps_per_s(self) -> float:
        return self.steps / self.total_time if self.total_time else 0.0

    def summary(self) -> Dict[str, float]:
        return {
            "steps": self.steps,
            "wall_s": round(self.total_time, 3),
            "steps_per_s": round(self.steps_per_s, 2),
            "edges_per_s": round(self.edges_per_s, 1),
            "nodes_per_s": round(
                self.total_nodes / self.total_time, 1
            ) if self.total_time else 0.0,
        }

    def reset(self) -> None:
        self.__init__()


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """XLA profiler trace around a block (open in TensorBoard's profiler
    or Perfetto).  No-op if the profiler cannot start (e.g. remote-relay
    backends that do not support tracing)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def make_run_logger(log_dir: str, run_name: str,
                    config: Optional[Dict[str, Any]] = None
                    ) -> logging.Logger:
    """File+console logger; writes the config as the first record — the
    reference's exp_logs behavior (exp_pretraining.py:210-215), with
    actual per-epoch records to follow instead of stopping there."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir,
                        f"{run_name}-{time.strftime('%Y%m%d-%H%M%S')}.log")
    logger = logging.getLogger(f"scgib_tpu.{run_name}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(path)
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    logger.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(sh)
    if config is not None:
        logger.info("config %s", json.dumps(config, default=str))
    return logger
