"""Environment knobs (kernel-path selectors) with a stale-trace tripwire.

Several kernel-path selectors (SCGIB_USE_PALLAS, SCGIB_SAGE_PALLAS,
SCGIB_GT_FLASH, SCGIB_POOL_PALLAS, SCGIB_SEGMENT_DENSE,
SCGIB_COMPUTE_DTYPE) are read inside module code that jax traces.  jax
caches jaxprs per (function, avals) — the knob's value is baked into the
first trace and is NOT part of the cache key, so flipping the variable
after the first compile silently reuses the stale trace (ADVICE round 4;
the same pitfall ops/pallas/gt_flash.py's bf16 knob documents).

Contract: **set knobs before the first trace** (i.e. before any jitted
step/eval function runs).  ``env_knob`` enforces this loudly instead of
silently: the first read of each name records its value, and any later
read that sees a different value emits a RuntimeWarning naming the
hazard.  Un-jitted callers (the CPU parity tests flip knobs around eager
``Module.apply`` calls) still observe the new value — only the warning
fires, because for them each call re-executes Python and the new value
IS honored.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, Optional

_seen: Dict[str, Optional[str]] = {}


def env_knob(name: str, default: Optional[str] = None) -> Optional[str]:
    """``os.environ.get(name, default)`` + warn when the value changed
    after its first read in this process (see module docstring)."""
    val = os.environ.get(name, default)
    if name not in _seen:
        _seen[name] = val
    elif _seen[name] != val:
        warnings.warn(
            f"{name} changed from {_seen[name]!r} to {val!r} after its "
            f"first use: any jitted computation traced with the old value "
            f"will NOT retrace (jax caches jaxprs per function+avals). "
            f"Set kernel-path knobs before the first trace.",
            RuntimeWarning, stacklevel=3)
        _seen[name] = val
    return val


def env_flag(name: str, default: str = "1") -> bool:
    return env_knob(name, default) == "1"
