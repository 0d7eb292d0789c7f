"""Command-line driver — the single replacement for the reference's 12
``exp_*.py`` scripts (SURVEY.md §1 L6).

Subcommands:
  pretrain      3-stage curriculum self-supervised pretraining
                (exp_pretraining.py flow: PCQM4Mv2 -> QM9 -> mol-PCBA,
                stage skipped when its checkpoint exists)
  finetune      supervised fine-tune on a downstream dataset with
                test-at-best-val selection (exp_moleculenetBACE_BBBP.py)
  adapt         unsupervised domain adaptation (run_domain_adaptation)
  eval          standalone evaluation of a saved fine-tuned checkpoint
                (the reference's evaluate_network as a command)
  preprocess    build the packed .npz dataset cache (k-hop ego-nets)
                from a raw edge-list/feature dump or synthetic data

Real dataset files are expected as .npz caches (data/cache.py format); in
this offline environment ``--synthetic N`` generates molecule-like graphs
with the same statistics instead (data/synthetic.py).

Usage examples:
  python -m scgib_tpu.cli pretrain --synthetic 2000 --epochs 3
  python -m scgib_tpu.cli finetune --dataset BACE --synthetic 800 \
      --pretrained outputs/pretrain.msgpack
  python -m scgib_tpu.cli preprocess --synthetic 1000 --k 1 \
      --out pts/synth.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _build_dataset(args, num_tasks=None, feat_dim=9):
    from .data.cache import load_dataset
    from .data.loader import GraphDataset
    from .data.synthetic import random_dataset

    if args.cache and os.path.exists(args.cache):
        return load_dataset(args.cache)
    if getattr(args, "tudataset_root", None):
        from .data.tudataset import load_tudataset

        graphs = load_tudataset(args.tudataset_root, args.dataset)
        return GraphDataset(graphs, k=args.k)
    if getattr(args, "molnet_root", None):
        from .data.molnet import load_moleculenet

        graphs, skipped = load_moleculenet(
            args.molnet_root, args.dataset, limit=args.limit or None)
        if skipped:
            print(f"skipped {len(skipped)} unparseable SMILES "
                  f"(reference behavior: exp_*BACE_BBBP.py:308-323)")
        return GraphDataset(graphs, k=args.k)
    if getattr(args, "ogb_raw", None):
        from .data.molnet import load_ogb_graphs

        graphs = load_ogb_graphs(args.ogb_raw, limit=args.limit or None)
        return GraphDataset(graphs, k=args.k)
    if getattr(args, "qm9_root", None):
        from .data.sdf import load_qm9

        graphs, skipped = load_qm9(args.qm9_root, limit=args.limit or None)
        if skipped:
            print(f"skipped {skipped} malformed SDF records")
        return GraphDataset(graphs, k=args.k)
    if getattr(args, "pcqm4mv2_root", None):
        from .data.molnet import load_pcqm4mv2

        graphs, skipped = load_pcqm4mv2(args.pcqm4mv2_root,
                                        limit=args.limit or None)
        if skipped:
            print(f"skipped {len(skipped)} unparseable SMILES")
        return GraphDataset(graphs, k=args.k)
    if getattr(args, "zinc_root", None):
        from .data.zinc import load_zinc

        graphs = load_zinc(args.zinc_root,
                           split=getattr(args, "zinc_split", "train"),
                           limit=args.limit or None)
        return GraphDataset(graphs, k=args.k)
    if getattr(args, "peptides_root", None):
        from .data.molnet import load_peptides

        which = "struct" if "struct" in (args.dataset or "").lower() \
            else "func"
        graphs, skipped = load_peptides(args.peptides_root, which=which,
                                        limit=args.limit or None)
        if skipped:
            print(f"skipped {len(skipped)} unparseable SMILES")
        return GraphDataset(graphs, k=args.k)
    if getattr(args, "smiles_csv", None):
        from .data.molnet import load_smiles_csv

        graphs, skipped = load_smiles_csv(
            args.smiles_csv, label_cols=slice(1, None),
            limit=args.limit or None)
        if skipped:
            print(f"skipped {len(skipped)} unparseable SMILES")
        return GraphDataset(graphs, k=args.k)
    if args.synthetic:
        if getattr(args, "synthetic_mode", "random") == "structured":
            from .data.synthetic import structured_dataset
            graphs = structured_dataset(args.synthetic, seed=args.seed,
                                        feat_dim=feat_dim)
        else:
            graphs = random_dataset(args.synthetic, seed=args.seed,
                                    feat_dim=feat_dim,
                                    num_tasks=num_tasks)
        return GraphDataset(graphs, k=args.k)
    raise SystemExit("no data: pass --cache <npz>, --molnet_root DIR, "
                     "--ogb_raw DIR, --smiles_csv FILE, "
                     "--tudataset_root DIR or --synthetic N")


def cmd_preprocess(args):
    from .data.cache import save_dataset

    t0 = time.time()
    ds = _build_dataset(args)
    save_dataset(args.out, ds)
    print(f"wrote {len(ds)} graphs (k={ds.k}) to {args.out} "
          f"in {time.time() - t0:.1f}s")


def _args_config(args):
    return {k: v for k, v in vars(args).items() if k != "fn"}


def _common_model_kwargs(args):
    return dict(hidden=args.hidden, d_transfer=args.d_transfer,
                encoder=args.encoder, num_layers=args.num_layers,
                num_heads=args.num_heads, readout=args.readout,
                use_att=bool(args.use_att))


def cmd_pretrain(args):
    import jax

    from .data.loader import plan_capacities
    from .models.scgib import PretrainModel
    from .train import checkpoint as ckpt
    from .train.loops import run_pretraining
    from .train.trainer import (TrainState, adam_l2, init_model,
                                make_pretrain_step)

    if args.curriculum:
        return _run_curriculum(args)

    ds = _build_dataset(args)
    caps = plan_capacities(ds, args.batch_size)
    feat_dim = ds.graphs[0].node_feat.shape[1]

    model = PretrainModel(in_dim=feat_dim,
                          recons_type=args.recons_type,
                          kl_mode=args.kl_mode,
                          k_transition=args.k,
                          **_common_model_kwargs(args))
    from .data.loader import batch_iterator

    logm_k = args.k if args.recons_type == "logM" else None
    g0, sub0 = next(batch_iterator(ds, args.batch_size, caps,
                                   shuffle=False, logm_k=logm_k))
    if args.pretrained and os.path.exists(args.pretrained):
        variables, _ = ckpt.load_checkpoint(args.pretrained)
        print(f"resumed from {args.pretrained}")
    else:
        variables = init_model(model,
            {"params": jax.random.PRNGKey(args.seed),
             "noise": jax.random.PRNGKey(args.seed + 1)},
            g0, sub0, train=True)

    tx = adam_l2(args.lr, weight_decay=args.weight_decay)
    state = TrainState.create(variables, tx)
    sb = getattr(args, "superbatch", 0)
    sb_specs = None
    if sb:
        from .data.loader import superbatch_spec
        from .train.trainer import make_pretrain_superbatch_step

        sb_specs = superbatch_spec(ds, args.batch_size, caps, sb,
                                   logm_k=logm_k)
        step = make_pretrain_superbatch_step(model, tx,
                                             byte_spec=sb_specs)
    else:
        step = make_pretrain_step(model, tx)
    state, info = run_pretraining(step, state, ds, caps, args.batch_size,
                                  epochs=args.epochs,
                                  patience=args.patience, seed=args.seed,
                                  autosave_path=args.autosave or None,
                                  autosave_every=args.autosave_every,
                                  superbatch_k=sb,
                                  superbatch_spec=sb_specs,
                                  logm_k=(args.k if
                                          args.recons_type == "logM"
                                          else None))
    out = args.out or "outputs/pretrain.msgpack"
    ckpt.save_checkpoint(out, info["best_variables"],
                         config=_args_config(args), step=info["best_epoch"])
    print(f"saved best (epoch {info['best_epoch']}, "
          f"loss {info['best_loss']:.5f}) to {out}")


def _run_curriculum(args):
    """3-stage curriculum (exp_pretraining.py:101-141): train on each
    stage dataset in turn, carrying the CORE forward (fresh projection +
    head per stage since feature dims differ, as Mainmodel_continue
    rebuilds transfer_d/MLP); each stage's checkpoint is skipped when its
    output file already exists.

    Stages come from --stage_caches (comma-separated .npz paths) or, with
    --synthetic N, synthetic stand-ins with the reference's feature dims
    (PCQM4Mv2 9, QM9 11, mol-PCBA 9; exp_pretraining.py:218-219)."""
    import jax

    from .config import PRETRAIN_STAGES
    from .data.loader import GraphDataset, batch_iterator, plan_capacities
    from .data.cache import load_dataset
    from .data.synthetic import random_dataset
    from .models.scgib import PretrainModel
    from .train import checkpoint as ckpt
    from .train.loops import run_pretraining
    from .train.trainer import (TrainState, adam_l2, init_model,
                                make_pretrain_step)

    if args.stage_caches:
        stage_data = []
        for i, path in enumerate(args.stage_caches.split(",")):
            ds = load_dataset(path)
            stage_data.append((os.path.basename(path), ds))
    else:
        if not args.synthetic:
            raise SystemExit("curriculum needs --stage_caches or "
                             "--synthetic N")
        if getattr(args, "synthetic_mode", "random") == "structured":
            from .data.synthetic import structured_dataset as _gen
        else:
            def _gen(n, seed, feat_dim):
                return random_dataset(n, seed=seed, feat_dim=feat_dim)
        stage_data = [
            (name, GraphDataset(_gen(
                args.synthetic, seed=args.seed + i, feat_dim=fd),
                k=args.k))
            for i, (name, fd) in enumerate(PRETRAIN_STAGES)]

    out_dir = os.path.dirname(args.out or "outputs/x") or "outputs"
    prev_core = None
    names = []
    for stage_i, (name, ds) in enumerate(stage_data):
        names.append(name)
        cp_path = os.path.join(
            out_dir,
            ckpt.checkpoint_name("pre_training", names, args.encoder,
                                 args.hidden, args.num_layers, args.k)
            + ".msgpack")
        if ckpt.exists(cp_path):
            print(f"stage {stage_i} ({name}): checkpoint exists, skipping")
            prev_core, _ = ckpt.load_checkpoint(cp_path)
            continue
        feat_dim = ds.graphs[0].node_feat.shape[1]
        caps = plan_capacities(ds, args.batch_size)
        model = PretrainModel(in_dim=feat_dim,
                              recons_type=args.recons_type,
                              kl_mode=args.kl_mode, k_transition=args.k,
                              **_common_model_kwargs(args))
        logm_k = args.k if args.recons_type == "logM" else None
        g0, sub0 = next(batch_iterator(ds, args.batch_size, caps,
                                       shuffle=False, logm_k=logm_k))
        variables = init_model(model,
            {"params": jax.random.PRNGKey(args.seed + stage_i),
             "noise": jax.random.PRNGKey(args.seed + stage_i + 1)},
            g0, sub0, train=True)
        if prev_core is not None:
            variables = ckpt.load_core_into(variables, prev_core)
        tx = adam_l2(args.lr, weight_decay=args.weight_decay)
        state = TrainState.create(variables, tx)
        sb = getattr(args, "superbatch", 0)
        sb_specs = None
        if sb:
            from .data.loader import superbatch_spec
            from .train.trainer import make_pretrain_superbatch_step

            sb_specs = superbatch_spec(ds, args.batch_size, caps, sb,
                                       logm_k=logm_k)
            step = make_pretrain_superbatch_step(model, tx,
                                                 byte_spec=sb_specs)
        else:
            step = make_pretrain_step(model, tx)
        print(f"stage {stage_i} ({name}): {len(ds)} graphs, "
              f"feat_dim {feat_dim}")
        autosave = getattr(args, "autosave", None)
        state, info = run_pretraining(
            step, state, ds, caps, args.batch_size, epochs=args.epochs,
            patience=args.patience, seed=args.seed + stage_i,
            logm_k=logm_k, superbatch_k=sb, superbatch_spec=sb_specs,
            autosave_path=(f"{autosave}.stage{stage_i}" if autosave
                           else None),
            autosave_every=getattr(args, "autosave_every", 1))
        ckpt.save_checkpoint(cp_path, info["best_variables"],
                             config=_args_config(args),
                             step=info["best_epoch"])
        prev_core = info["best_variables"]
        print(f"stage {stage_i} ({name}): best loss "
              f"{info['best_loss']:.5f} -> {cp_path}")
    print(f"curriculum complete: {cp_path}")


def cmd_finetune(args):
    import jax

    from .config import DATASETS
    from .data.loader import plan_capacities
    from .models.scgib import FinetuneModel
    from .train import checkpoint as ckpt
    from .train.loops import run_finetune
    from .train.trainer import (TrainState, adam_l2, init_model,
                                finetune_trainable_mask,
                                make_eval_fn, make_finetune_step, masked_tx)

    spec = DATASETS.get(args.dataset)
    if spec is None:
        raise SystemExit(f"unknown dataset {args.dataset!r}; "
                         f"known: {sorted(DATASETS)}")

    from .config import reference_split

    ds = _build_dataset(args, num_tasks=spec.num_tasks,
                        feat_dim=spec.feat_dim)
    caps = plan_capacities(ds, args.batch_size)
    # most exp scripts random.shuffle samples first
    # (exp_moleculenetBACE_BBBP.py:276), then take the hardcoded prefix
    # slices of molecules.py:211-343
    order = np.random.default_rng(args.seed).permutation(len(ds))
    tr_idx, va_idx, te_idx = reference_split(len(ds), spec)
    train_ds = ds.subset(order[list(tr_idx)])
    val_ds = ds.subset(order[list(va_idx)])
    test_ds = ds.subset(order[list(te_idx)])

    pre_vars = None
    pre_meta = None
    if args.pretrained and os.path.exists(args.pretrained) and \
            args.pretrained.endswith(".pt"):
        # import the reference torch pickle FIRST: the shipped artifact
        # has 5 conv layers although the released GIN class builds 4
        # (reference_import.py) — the model depth must match it
        from .utils.reference_import import (
            convert_to_pretrain_variables, load_reference_state)

        flat = load_reference_state(args.pretrained)
        pre_vars, pre_meta = convert_to_pretrain_variables(flat)
        if pre_meta["num_convs"] != args.num_layers:
            print(f"imported checkpoint has {pre_meta['num_convs']} conv "
                  f"layers; overriding --num_layers {args.num_layers}")
            args.num_layers = pre_meta["num_convs"]

    feat_dim = ds.graphs[0].node_feat.shape[1]
    model = FinetuneModel(in_dim=feat_dim, num_out=spec.num_tasks,
                          regression=spec.regression_head,
                          **_common_model_kwargs(args))
    from .data.loader import batch_iterator

    g0, sub0 = next(batch_iterator(train_ds, args.batch_size, caps,
                                   shuffle=False))
    variables = init_model(model,
        {"params": jax.random.PRNGKey(args.seed),
         "noise": jax.random.PRNGKey(args.seed + 1)},
        g0, sub0, train=True)

    if args.pretrained and os.path.exists(args.pretrained):
        if pre_vars is not None:
            print(f"imported reference checkpoint "
                  f"(core depth {pre_meta['core_depth']}, "
                  f"{pre_meta['num_convs']} convs)")
        else:
            pre_vars, _ = ckpt.load_checkpoint(args.pretrained)
        variables = ckpt.load_core_into(variables, pre_vars)
        print(f"loaded pretrained core from {args.pretrained}")

    mask = finetune_trainable_mask(variables["params"], args.freeze_mode)
    tx = masked_tx(adam_l2(args.lr, weight_decay=args.weight_decay), mask)
    step = make_finetune_step(model, tx, loss_type=spec.loss,
                              grad_accum=spec.grad_accum)
    eval_fn = make_eval_fn(model)

    # TUDataset-style repeats: fresh heads per run, mean +- std reported
    # (exp_tudataset.py:150-160)
    repeats = args.repeats if args.repeats else spec.repeats
    values = []
    result = None
    for rep in range(repeats):
        rep_vars = variables
        if rep > 0:
            import jax as _jax
            rep_vars = init_model(model,
                {"params": _jax.random.PRNGKey(args.seed + 100 + rep),
                 "noise": _jax.random.PRNGKey(args.seed + 200 + rep)},
                g0, sub0, train=True)
            if args.pretrained and os.path.exists(args.pretrained):
                rep_vars = ckpt.load_core_into(rep_vars, pre_vars)
        state = TrainState.create(rep_vars, tx)
        autosave = getattr(args, "autosave", None)
        result = run_finetune(step, eval_fn, state, train_ds, val_ds,
                              test_ds, caps, args.batch_size, spec,
                              epochs=args.epochs, patience=args.patience,
                              seed=args.seed + rep,
                              autosave_path=(f"{autosave}.rep{rep}"
                                             if autosave else None),
                              autosave_every=getattr(
                                  args, "autosave_every", 1))
        values.append(result["test_at_best_val"])
    mean = float(np.mean(values))
    std = float(np.std(values))
    print(f"RESULT {args.dataset}: {spec.metric} "
          f"test@best-val = {mean:.5f} +- {std:.5f} "
          f"over {repeats} run(s)")
    if args.out:
        # the reference never persists the fine-tuned module — it only
        # reports the selected test metric; saving it (last repeat's
        # final weights + the selection bookkeeping) makes `cli eval`
        # possible
        ckpt.save_checkpoint(args.out, result["state"].variables,
                             config=dict(_args_config(args),
                                         best_epoch=result["best_epoch"],
                                         best_val=result["best_val"]),
                             step=result["best_epoch"])
        print(f"saved fine-tuned model to {args.out}")
    if getattr(args, "xlsx", None):
        # Mean / Variant / Best_epoch cells, the reference's Excel layout
        # (script_classification.py:57-68, exp_pcqm4mv2.py:167-169)
        from .utils.results import update_evaluation_value

        path = update_evaluation_value(args.xlsx, args.dataset, "Mean",
                                       mean)
        update_evaluation_value(args.xlsx, args.dataset, "Variant", std)
        update_evaluation_value(args.xlsx, args.dataset, "Best_epoch",
                                result["best_epoch"])
        print(f"recorded results in {path}")
    if getattr(args, "journal", None):
        from .utils.results import append_result

        append_result(args.journal,
                      {"dataset": args.dataset, "metric": spec.metric,
                       "mean": mean, "std": std, "runs": values,
                       "best_epoch": result["best_epoch"],
                       "config": _args_config(args)})
    return {"mean": mean, "std": std, "runs": values, "last": result}


def cmd_eval(args):
    """Standalone evaluation of a saved fine-tuned checkpoint — the
    reference's ``evaluate_network`` (train_moleculenetBACE.py:180-199)
    as a first-class command instead of a loop-internal helper."""
    from .config import DATASETS, reference_split
    from .data.loader import plan_capacities
    from .models.scgib import FinetuneModel
    from .train import checkpoint as ckpt
    from .train.loops import evaluate
    from .train.trainer import make_eval_fn

    spec = DATASETS.get(args.dataset)
    if spec is None:
        raise SystemExit(f"unknown dataset {args.dataset!r}; "
                         f"known: {sorted(DATASETS)}")
    variables, meta = ckpt.load_checkpoint(args.checkpoint)
    cfg = (meta or {}).get("config", {})

    def pick(name):
        v = cfg.get(name)
        return getattr(args, name) if v is None else v

    ds = _build_dataset(args, num_tasks=spec.num_tasks,
                        feat_dim=spec.feat_dim)
    caps = plan_capacities(ds, args.batch_size)
    feat_dim = ds.graphs[0].node_feat.shape[1]
    model = FinetuneModel(in_dim=feat_dim, num_out=spec.num_tasks,
                          regression=spec.regression_head,
                          hidden=int(pick("hidden")),
                          d_transfer=int(pick("d_transfer")),
                          encoder=pick("encoder"),
                          num_layers=int(pick("num_layers")),
                          num_heads=int(pick("num_heads")),
                          readout=pick("readout"),
                          use_att=bool(int(pick("use_att"))))
    eval_fn = make_eval_fn(model)

    if args.split == "full":
        splits = {"full": ds}
    else:
        # the exact split the finetune driver used: shuffle with the
        # run's seed, then the reference's hardcoded prefix slices
        order = np.random.default_rng(int(pick("seed"))).permutation(
            len(ds))
        tr, va, te = reference_split(len(ds), spec)
        table = {"train": ds.subset(order[list(tr)]),
                 "val": ds.subset(order[list(va)]),
                 "test": ds.subset(order[list(te)])}
        splits = table if args.split == "all" else \
            {args.split: table[args.split]}
    out = {}
    for name, d in splits.items():
        out[name] = evaluate(eval_fn, variables, d, caps,
                             args.batch_size, spec)
        print(f"EVAL {args.dataset} {name}: "
              f"{spec.metric} = {out[name]:.5f} ({len(d)} graphs)")
    return out


def cmd_adapt(args):
    import jax

    from .data.loader import plan_capacities, batch_iterator
    from .models.scgib import DomainAdaptModel
    from .train import checkpoint as ckpt
    from .train.loops import run_domain_adaptation
    from .train.trainer import (TrainState, adam_l2, init_model,
                                make_domainadapt_step)

    ds = _build_dataset(args)
    caps = plan_capacities(ds, args.batch_size)
    pre_vars = None
    if args.pretrained and os.path.exists(args.pretrained):
        if args.pretrained.endswith(".pt"):
            # the reference runs adaptation straight from its torch
            # pickle (exp_*BACE_BBBP.py:120-130); import it in-process
            # and adopt the artifact's conv depth (5 in the shipped one)
            from .utils.reference_import import (
                convert_to_pretrain_variables, load_reference_state)

            pre_vars, pre_meta = convert_to_pretrain_variables(
                load_reference_state(args.pretrained))
            if pre_meta["num_convs"] != args.num_layers:
                print(f"imported checkpoint has {pre_meta['num_convs']} "
                      f"conv layers; overriding --num_layers "
                      f"{args.num_layers}")
                args.num_layers = pre_meta["num_convs"]
        else:
            pre_vars, _ = ckpt.load_checkpoint(args.pretrained)
    feat_dim = ds.graphs[0].node_feat.shape[1]
    model = DomainAdaptModel(in_dim=feat_dim, **_common_model_kwargs(args))
    g0, sub0 = next(batch_iterator(ds, args.batch_size, caps,
                                   shuffle=False))
    variables = init_model(model,
        {"params": jax.random.PRNGKey(args.seed),
         "noise": jax.random.PRNGKey(args.seed + 1)},
        g0, sub0, train=True)
    if pre_vars is not None:
        variables = ckpt.load_core_into(variables, pre_vars)

    tx = adam_l2(args.lr, weight_decay=args.weight_decay)
    state = TrainState.create(variables, tx)
    step = make_domainadapt_step(model, tx)
    state, info = run_domain_adaptation(
        step, state, ds, caps, args.batch_size, epochs=args.epochs,
        patience=20, seed=args.seed,
        autosave_path=getattr(args, "autosave", None) or None,
        autosave_every=getattr(args, "autosave_every", 1))
    out = args.out or "outputs/adapted.msgpack"
    ckpt.save_checkpoint(out, info["best_variables"],
                         config=_args_config(args))
    print(f"saved adapted model (loss {info['best_loss']:.5f}) to {out}")


def cmd_download(args):
    from .data.download import download_dataset

    for name in args.dataset:
        written = download_dataset(name, args.root,
                                   base_url=args.base_url,
                                   force=args.force)
        print(f"{name}: {len(written)} file(s) under {args.root}")
        for w in written:
            print(f"  {w}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="scgib_tpu",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, lr, wd, epochs):
        sp.add_argument("--cache", default=None,
                        help=".npz dataset cache (data/cache.py format)")
        sp.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic molecules instead")
        sp.add_argument("--synthetic_mode", default="random",
                        choices=["random", "structured"],
                        help="synthetic corpus flavor: 'structured' has "
                             "structure-correlated node features so "
                             "pretraining has signal to compress "
                             "(data/synthetic.py::structured_dataset)")
        sp.add_argument("--molnet_root", default=None,
                        help="MoleculeNet root dir with raw CSVs "
                             "(data/molnet.py)")
        sp.add_argument("--ogb_raw", default=None,
                        help="OGB graph-prop raw/ dir (flat CSV layout)")
        sp.add_argument("--smiles_csv", default=None,
                        help="generic SMILES+labels CSV")
        sp.add_argument("--qm9_root", default=None,
                        help="dir holding gdb9.sdf (+ gdb9.sdf.csv)")
        sp.add_argument("--pcqm4mv2_root", default=None,
                        help="dir holding PCQM4Mv2 raw/data.csv.gz")
        sp.add_argument("--peptides_root", default=None,
                        help="dir holding the LRGB peptides tables")
        sp.add_argument("--zinc_root", default=None,
                        help="dir holding ZINC <split>.pickle "
                             "(benchmarking-gnns format)")
        sp.add_argument("--zinc_split", default="train",
                        choices=["train", "val", "test"])
        sp.add_argument("--limit", type=int, default=0,
                        help="cap graphs loaded (reference caps PCQM4Mv2/"
                             "QM9 at 100k, exp_pcqm4mv2.py:394)")
        sp.add_argument("--k", type=int, default=1,
                        help="k-hop ego-net radius (--k_transition)")
        sp.add_argument("--batch_size", type=int, default=128)
        sp.add_argument("--hidden", type=int, default=64)
        sp.add_argument("--d_transfer", type=int, default=32)
        sp.add_argument("--encoder", default="GIN",
                        choices=["GIN", "GCN", "GraphSAGE", "Transformer"])
        sp.add_argument("--num_layers", type=int, default=4)
        sp.add_argument("--num_heads", type=int, default=8)
        sp.add_argument("--readout", default="sum", choices=["sum", "s2s"])
        sp.add_argument("--use_att", type=int, default=1)
        sp.add_argument("--lr", type=float, default=lr)
        sp.add_argument("--weight_decay", type=float, default=wd)
        sp.add_argument("--epochs", type=int, default=epochs)
        sp.add_argument("--patience", type=int, default=50)
        sp.add_argument("--seed", type=int, default=42)
        sp.add_argument("--pretrained", default=None)
        sp.add_argument("--repeats", type=int, default=0,
                        help="override dataset's repeat count")
        sp.add_argument("--out", default=None)

    sp = sub.add_parser("preprocess", help="build packed dataset cache")
    sp.add_argument("--cache", default=None)
    sp.add_argument("--synthetic", type=int, default=0)
    sp.add_argument("--dataset", default=None,
                    help="dataset name for --molnet_root/--tudataset_root")
    sp.add_argument("--molnet_root", default=None)
    sp.add_argument("--ogb_raw", default=None)
    sp.add_argument("--smiles_csv", default=None)
    sp.add_argument("--qm9_root", default=None)
    sp.add_argument("--pcqm4mv2_root", default=None)
    sp.add_argument("--peptides_root", default=None)
    sp.add_argument("--zinc_root", default=None)
    sp.add_argument("--zinc_split", default="train",
                    choices=["train", "val", "test"])
    sp.add_argument("--tudataset_root", default=None)
    sp.add_argument("--limit", type=int, default=0)
    sp.add_argument("--k", type=int, default=1)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("pretrain", help="self-supervised pretraining")
    common(sp, lr=1e-4, wd=5e-5, epochs=100)
    sp.add_argument("--recons_type", default="adj",
                    choices=["adj", "logM"])
    sp.add_argument("--kl_mode", default="corrected",
                    choices=["corrected", "reference"])
    sp.add_argument("--curriculum", action="store_true",
                    help="3-stage curriculum (exp_pretraining flow)")
    sp.add_argument("--superbatch", type=int, default=0,
                    help="ship K wire-format batches per device dispatch "
                         "(amortizes link round trips; 0 = per-batch)")
    sp.add_argument("--autosave", default=None,
                    help="full-train-state autosave path: resumes "
                         "automatically after preemption/crash")
    sp.add_argument("--autosave_every", type=int, default=1,
                    help="autosave cadence in epochs")
    sp.add_argument("--stage_caches", default=None,
                    help="comma-separated stage .npz caches")
    sp.set_defaults(fn=cmd_pretrain)

    sp = sub.add_parser("finetune", help="supervised fine-tuning")
    common(sp, lr=1e-3, wd=1e-5, epochs=50)
    sp.add_argument("--autosave", default=None,
                    help="full-train-state autosave path prefix "
                         "(per-repeat suffix .repN)")
    sp.add_argument("--autosave_every", type=int, default=1)
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--tudataset_root", default=None,
                    help="directory holding raw TUDataset text files")
    sp.add_argument("--freeze_mode", default="reference",
                    choices=["reference", "paper", "all", "frozen"])
    sp.add_argument("--xlsx", default=None,
                    help="record Mean/Variant/Best_epoch in this Excel "
                         "sheet (reference outputs_excels.xlsx behavior)")
    sp.add_argument("--journal", default=None,
                    help="append a JSON result record to this JSONL file")
    sp.set_defaults(fn=cmd_finetune)

    sp = sub.add_parser("eval", help="evaluate a saved fine-tuned "
                                     "checkpoint on a dataset split")
    common(sp, lr=1e-3, wd=1e-5, epochs=0)
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--tudataset_root", default=None)
    sp.add_argument("--checkpoint", required=True,
                    help="fine-tuned .msgpack from `finetune --out`")
    sp.add_argument("--split", default="test",
                    choices=["train", "val", "test", "all", "full"])
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser(
        "download",
        help="fetch a dataset's raw upstream files into the layout the "
             "readers expect (the reference's PyG/OGB download step, "
             "exp_moleculenetBACE_BBBP.py:219-224)")
    sp.add_argument("--dataset", required=True, action="append",
                    help="dataset name (repeatable); see "
                         "scgib_tpu.data.download.REGISTRY")
    sp.add_argument("--root", required=True,
                    help="destination root directory")
    sp.add_argument("--base_url", default=None,
                    help="mirror base URL (air-gapped setups / tests)")
    sp.add_argument("--force", action="store_true",
                    help="re-fetch even if files exist")
    sp.set_defaults(fn=cmd_download)

    sp = sub.add_parser("adapt", help="unsupervised domain adaptation")
    common(sp, lr=1e-3, wd=1e-5, epochs=50)
    sp.add_argument("--dataset", default=None,
                    help="dataset name for --molnet_root/--tudataset_root")
    sp.add_argument("--tudataset_root", default=None)
    sp.add_argument("--autosave", default=None,
                    help="full-train-state autosave path")
    sp.add_argument("--autosave_every", type=int, default=1)
    sp.set_defaults(fn=cmd_adapt)

    return p


def _enable_compile_cache():
    """Persistent XLA compilation cache (SCGIB_COMPILE_CACHE to move it,
    =0 to disable).  Compiles through a remote/tunneled device vary
    7-120 s each; caching them on disk makes reruns start hot."""
    cache = os.environ.get("SCGIB_COMPILE_CACHE", ".jax_cache")
    if cache == "0":
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    args = build_parser().parse_args(argv)
    _enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    main()
