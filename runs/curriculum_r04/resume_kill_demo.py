"""kill -9 + resume bit-identity demonstration (OS-level SIGKILL).

Runs the same pretraining three ways on a CPU backend:
  A) 6 epochs uninterrupted;
  B) a subprocess autosaving every epoch, SIGKILLed from outside mid-run,
     then resumed by a fresh process to 6 epochs;
and asserts A and B end with BIT-IDENTICAL parameters and optimizer
moments.  Complements tests/test_autosave.py (in-process interruption)
with a real `kill -9`.  Writes resume_determinism.json next to this
file.
"""
import json
import os
import signal
import subprocess
import sys
import time

BASE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(BASE, "_resume_worker.py")

WORKER_SRC = '''
import sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from scgib_tpu.data.loader import GraphDataset, plan_capacities, \
    batch_iterator
from scgib_tpu.data.synthetic import random_dataset
from scgib_tpu.models.scgib import PretrainModel
from scgib_tpu.train.loops import run_pretraining
from scgib_tpu.train.trainer import TrainState, adam_l2, init_model, \
    make_pretrain_step

autosave, out, epochs, slow = (sys.argv[1], sys.argv[2],
                               int(sys.argv[3]), sys.argv[4] == "1")
ds = GraphDataset(random_dataset(256, seed=9, min_nodes=6, max_nodes=14,
                                 feat_dim=9), k=1)
caps = plan_capacities(ds, 32)
model = PretrainModel(in_dim=9, hidden=16, d_transfer=8)
g0, sub0 = next(batch_iterator(ds, 32, caps, shuffle=False))
variables = init_model(model, {"params": jax.random.PRNGKey(0),
                               "noise": jax.random.PRNGKey(1)},
                       g0, sub0, train=True)
tx = adam_l2(1e-3, weight_decay=5e-5)
step = make_pretrain_step(model, tx, donate=False)


def log(msg):
    print(msg, flush=True)
    if slow:
        import time
        time.sleep(1.0)   # widen the window the SIGKILL can land in


state, info = run_pretraining(step, TrainState.create(variables, tx),
                              ds, caps, 32, epochs=epochs, seed=17,
                              log=log, autosave_path=autosave or None)
host = jax.tree_util.tree_map(np.asarray, (state.params, state.opt_state))
import hashlib, pickle
blob = pickle.dumps(jax.tree_util.tree_map(
    lambda a: a.tobytes(), host))
with open(out, "w") as f:
    f.write(hashlib.sha256(blob).hexdigest())
print("FINAL_HASH_WRITTEN", flush=True)
'''


def run(args, **kw):
    return subprocess.Popen([sys.executable, WORKER] + args,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, **kw)


def main():
    with open(WORKER, "w") as f:
        f.write(WORKER_SRC)
    ha = os.path.join(BASE, "_hash_a.txt")
    hb = os.path.join(BASE, "_hash_b.txt")
    auto = os.path.join(BASE, "_demo_auto.msgpack")
    for p in (ha, hb, auto):
        if os.path.exists(p):
            os.remove(p)

    # A: uninterrupted
    pa = run(["", ha, "6", "0"])
    out_a, _ = pa.communicate(timeout=900)
    assert os.path.exists(ha), out_a

    # B: autosaving subprocess, SIGKILL after the 3rd epoch line
    pb = run([auto, hb, "6", "1"])
    epochs_seen = 0
    killed_at = None
    for line in pb.stdout:
        if "pretrain epoch" in line:
            epochs_seen += 1
            if epochs_seen == 3:
                os.kill(pb.pid, signal.SIGKILL)
                killed_at = line.strip()
                break
    pb.wait(timeout=60)
    assert pb.returncode == -signal.SIGKILL
    assert not os.path.exists(hb), "killed run must not have finished"

    # resume: fresh process picks up the autosave and completes
    pc = run([auto, hb, "6", "0"])
    out_c, _ = pc.communicate(timeout=900)
    assert "resumed autosave" in out_c, out_c
    assert os.path.exists(hb), out_c

    hash_a = open(ha).read().strip()
    hash_b = open(hb).read().strip()
    result = {
        "method": ("6-epoch pretrain, SIGKILL (-9) from outside after "
                   "epoch 3's autosave, fresh-process resume to 6; "
                   "sha256 over raw param+optimizer bytes"),
        "killed_at": killed_at,
        "resumed_line": [l for l in out_c.splitlines()
                         if "resumed autosave" in l][:1],
        "hash_uninterrupted": hash_a,
        "hash_killed_resumed": hash_b,
        "bit_identical": hash_a == hash_b,
    }
    with open(os.path.join(BASE, "resume_determinism.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    assert hash_a == hash_b, "resume is NOT bit-identical"
    for p in (ha, hb, auto, WORKER):
        if os.path.exists(p):
            os.remove(p)


if __name__ == "__main__":
    main()
