"""Per-device memory analysis: dp-only vs dp x sp at long-video shapes.

VERDICT r2 item 1 'done (b)': show compiled per-device activation memory
dropping ~1/sp at YouMakeup-like shapes (T=800..3000) once the MSDA runs
through the shard_map'd sp op.

Runs on CPU with virtual devices (no TPU needed — memory_analysis is a
property of the compiled partitioning, not the backend):

    python tools/sp_memory_report.py --t 800 --devices 8
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=800, help="frames")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--enc_layers", type=int, default=2)
    ap.add_argument("--halo_frac", type=float, default=0.125)
    ap.add_argument("--remat_ab", action="store_true",
                    help="also report dp-only temp with remat_trunk on "
                         "(layer rematerialization A/B at these shapes)")
    ap.add_argument("--clamp_report", action="store_true",
                    help="run one sp forward with the halo-clamp monitor on "
                         "and print the per-call clamped-tap counts (0 == "
                         "the sp output is exact vs dp at these offsets)")
    args = ap.parse_args()

    # force CPU + virtual devices BEFORE anything imports jax (importing
    # gvl_tpu first would initialize the tunneled-TPU 'axon' plugin and the
    # report would silently run on ONE device)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu" and \
        len(jax.devices()) == args.devices
    import jax.numpy as jnp
    import numpy as np

    from gvl_tpu.config import Config
    from gvl_tpu.models import build_model
    from gvl_tpu.parallel import make_mesh, replicate_tree, batch_sharding
    from gvl_tpu.parallel.sp import sp_context

    cfg = Config()
    cfg.update(dict(
        hidden_dim=args.hidden, nheads=8, enc_layers=args.enc_layers,
        dec_layers=2, transformer_ff_dim=args.hidden,
        num_feature_levels=4, num_queries=100, feature_dim=512,
        frame_embedding_num=args.t, with_box_refine=1, msda_impl="ref"))
    model = build_model(cfg)

    B, T, D = args.batch, args.t, cfg.feature_dim
    rng = np.random.RandomState(0)
    feats = rng.randn(B, T, D).astype(np.float32)
    mask = np.ones((B, T), bool)
    duration = rng.uniform(60, 600, (B,)).astype(np.float32)

    def loss_fn(params, feats, mask, duration):
        out = model.apply(params, feats, mask, duration)
        # encoder-dominated scalar loss: forces the full fwd+bwd through the
        # trunk, which is where the long-video activation memory lives
        return (out["memory"] ** 2).mean() + (out["pred_logits"] ** 2).mean()

    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(feats[:1]),
                           jnp.ones((1, T), bool),
                           jnp.asarray(duration[:1])))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)

    grad_fn = jax.grad(loss_fn)

    def report(mesh, label, use_sp, gfn=None):
        gfn = gfn or grad_fn
        p = replicate_tree(params, mesh)
        f = jax.device_put(jnp.asarray(feats),
                           batch_sharding(mesh, 3, seq_axis=1 if use_sp
                                          else None))
        m = jax.device_put(jnp.asarray(mask),
                           batch_sharding(mesh, 2, seq_axis=1 if use_sp
                                          else None))
        d = jax.device_put(jnp.asarray(duration), batch_sharding(mesh, 1))
        ctx = sp_context(mesh if use_sp else None,
                         halo_frac=args.halo_frac)
        with ctx:
            lowered = jax.jit(gfn).lower(p, f, m, d)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        stats = dict(
            temp_mb=ma.temp_size_in_bytes / 2**20,
            arg_mb=ma.argument_size_in_bytes / 2**20,
            out_mb=ma.output_size_in_bytes / 2**20,
        )
        print(f"{label:28s} temp={stats['temp_mb']:9.1f} MiB  "
              f"args={stats['arg_mb']:9.1f} MiB  "
              f"out={stats['out_mb']:9.1f} MiB")
        return stats

    n = args.devices
    mesh_dp = make_mesh(n, "dp")
    mesh_sp = make_mesh(n, "dp,sp")
    sp = mesh_sp.shape.get("sp", 1)
    mesh_dp_small = make_mesh(n // sp, "dp")
    print(f"T={T} B={B} hidden={cfg.hidden_dim} "
          f"enc_layers={cfg.enc_layers} devices={n} "
          f"(dp mesh {mesh_dp.shape}, sp mesh {mesh_sp.shape})")
    a = report(mesh_dp, f"dp={n} (no sp)", use_sp=False)
    d = report(mesh_dp_small, f"dp={n // sp} (no sp)", use_sp=False)
    b = report(mesh_sp, f"dp={n // sp} x sp={sp} (GSPMD only)", use_sp=False)
    c = report(mesh_sp, f"dp={n // sp} x sp={sp} (sp-MSDA)", use_sp=True)
    print(f"per-device temp: sp-MSDA vs same-dp no-sp = "
          f"{c['temp_mb'] / max(d['temp_mb'], 1e-9):.3f} (ideal 1/{sp} = "
          f"{1 / sp:.3f}); sp-MSDA vs GSPMD-only sp = "
          f"{c['temp_mb'] / max(b['temp_mb'], 1e-9):.3f}; "
          f"vs dp={n} (same tokens/device) = "
          f"{c['temp_mb'] / max(a['temp_mb'], 1e-9):.3f} (ideal ~1.0)")

    if args.clamp_report:
        # one real sp forward with the monitor: how many taps did the halo
        # clamp move? Raise --halo_frac until every row reads 0 (see
        # MIGRATION.md "sequence parallelism") — with random-init params
        # offsets are within +/-P positions and the default halo is enough
        p = replicate_tree(params, mesh_sp)
        f = jax.device_put(jnp.asarray(feats),
                           batch_sharding(mesh_sp, 3, seq_axis=1))
        m = jax.device_put(jnp.asarray(mask),
                           batch_sharding(mesh_sp, 2, seq_axis=1))
        d2 = jax.device_put(jnp.asarray(duration), batch_sharding(mesh_sp, 1))
        with sp_context(mesh_sp, halo_frac=args.halo_frac,
                        clamp_monitor=True):
            _, dbg = jax.jit(lambda p, f, m, d: model.apply(
                p, f, m, d, mutable=["sp_debug"]))(p, f, m, d2)
        flat = jax.tree_util.tree_flatten_with_path(dbg)[0]
        total = 0
        for path, leaf in flat:
            total += int(leaf)
            print(f"halo_clamped {jax.tree_util.keystr(path):60s} "
                  f"{int(leaf):10d}")
        print(f"halo_clamped TOTAL (halo_frac={args.halo_frac}): {total} "
              f"{'(sp exact)' if total == 0 else '(raise sp_halo_frac!)'}")

    if args.remat_ab:
        cfg_r = Config()
        cfg_r.update(dict(
            hidden_dim=args.hidden, nheads=8, enc_layers=args.enc_layers,
            dec_layers=2, transformer_ff_dim=args.hidden,
            num_feature_levels=4, num_queries=100, feature_dim=512,
            frame_embedding_num=args.t, with_box_refine=1, msda_impl="ref",
            remat_trunk=True))
        model_r = build_model(cfg_r)

        def loss_r(params, feats, mask, duration):
            out = model_r.apply(params, feats, mask, duration)
            return ((out["memory"] ** 2).mean()
                    + (out["pred_logits"] ** 2).mean())

        r = report(mesh_dp, f"dp={n} + remat_trunk", use_sp=False,
                   gfn=jax.grad(loss_r))
        print(f"per-device temp: remat_trunk vs dp={n} baseline = "
              f"{r['temp_mb'] / max(a['temp_mb'], 1e-9):.3f}")


if __name__ == "__main__":
    main()
