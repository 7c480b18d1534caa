"""Virtual-mesh scaling sweep: sharded-train parity at n in {8, 16, 32}.

Round-4 VERDICT weak #4: all sharded evidence stopped at the 8-device
virtual mesh; nothing exercised 16/32-way axis sizes, where axis-size and
halo assumptions (tile-row slabbing, pad-row masking, (data, tiles)
factorization) first break. This sweep runs, per device count n:

1. a full sharded-vs-single-device train-step parity check (loss, all five
   updated parameters, densify grad-norm signal) on a (data=2, tiles=n/2)
   mesh, at an image height chosen so the tile rows do NOT divide evenly
   across the slabs (the halo + pad-row edge case), and
2. ``__graft_entry__.dryrun_multichip(n)`` in toy mode (the driver's own
   multichip contract at that axis size).

Each n needs its own process: --xla_force_host_platform_device_count must
be set before the JAX backend initializes. Run from the repo root:

    python scripts/mesh_scale.py            # full sweep -> MESH_SCALE JSON
    python scripts/mesh_scale.py --worker N # one parity check (internal)
"""

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def worker(n: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    import jax.numpy as jnp

    from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render
    from gausplat_tpu.parallel import make_mesh
    from gausplat_tpu.parallel.render import stack_cameras
    from gausplat_tpu.parallel.train_step import make_sharded_train_step
    from gausplat_tpu.train.densify import zero_densify_acc
    from gausplat_tpu.train.losses import photometric_loss

    assert len(jax.devices()) == n, (len(jax.devices()), n)
    d_data = 2
    d_tiles = n // d_data
    # Image height: (d_tiles + 1) tile rows so the slab split is uneven —
    # every shard's pad-row masking and the last shard's short slab are
    # exercised at each axis size.
    w, h = 64, (d_tiles + 1) * 16
    opts = RenderOptions(backend="xla", tile_entry_capacity=8192, block_size=64)

    rng = np.random.default_rng(3)
    p = 60
    pts = Points(
        rng.random((p, 3)).astype(np.float32), rng.standard_normal((p, 3)) * 0.6
    )
    scene = GaussianScene.from_points(pts)
    scene = scene.set_scalings(
        jnp.asarray(0.05 + 0.1 * rng.random((p, 3)), jnp.float32)
    )
    scene = scene.set_opacities(
        jnp.asarray(0.3 + 0.5 * rng.random((p, 1)), jnp.float32)
    )

    views = []
    for i in range(2):
        a = 0.2 * i
        c, s = np.cos(a), np.sin(a)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pos = np.array([4 * s, 0.0, -4 * c])
        views.append(
            View(
                field_of_view_x=1.0, field_of_view_y=2.0,
                image_height=h, image_width=w, view_id=i,
                view_position=pos,
                view_transform=View.transform(rot.T, -rot @ pos),
            )
        )
    targets = [
        np.asarray(render(scene, v, opts).colors_rgb_2d) * 0.5 for v in views
    ]

    mesh = make_mesh((d_data, d_tiles), ("data", "tiles"))
    ssim_weight = 0.2  # exercises the halo exchange across slab boundaries
    step, optimizer, h_pad, _ = make_sharded_train_step(
        mesh, w, h, p, opts, ssim_weight=ssim_weight
    )
    cams = stack_cameras(views)
    tgt = jnp.asarray(
        np.stack([
            np.pad(t, ((0, h_pad - h), (0, 0), (0, 0)), constant_values=7.7)
            for t in targets
        ])
    )
    new_scene, _, acc, metrics = step(
        scene, optimizer.init(scene), zero_densify_acc(p), cams, tgt
    )

    def loss_fn(s, ref):
        total = 0.0
        for v, t in zip(views, targets):
            out = render(s, v, opts, positions_2d_grad_norm_ref=ref)
            total = total + photometric_loss(
                out.colors_rgb_2d, jnp.asarray(t), ssim_weight
            )
        return total / len(views)

    ref0 = jnp.zeros((p,), jnp.float32)
    loss_ref, (grads, grad_norm_ref) = jax.value_and_grad(
        loss_fn, argnums=(0, 1)
    )(scene, ref0)
    updates, _ = optimizer.update(grads, optimizer.init(scene), scene)
    ref_scene = jax.tree_util.tree_map(lambda q, u: q + u, scene, updates)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_ref), rtol=2e-4
    )
    assert int(metrics["tile_point_total"]) > 0
    for name in ("colors_sh", "opacities", "positions", "rotations", "scalings"):
        np.testing.assert_allclose(
            np.asarray(getattr(new_scene, name)),
            np.asarray(getattr(ref_scene, name)),
            atol=2e-5,
            err_msg=name,
        )
    got = np.asarray(acc["grad_norm_sum"])
    want = np.asarray(grad_norm_ref)
    scale = max(float(want.max()), 1e-12)
    np.testing.assert_allclose(got / scale, want / scale, atol=5e-5)
    print(
        json.dumps(
            {
                "n": n,
                "mesh": [d_data, d_tiles],
                "image": [w, h],
                "loss": float(metrics["loss"]),
                "loss_ref": float(loss_ref),
                "parity": "ok",
            }
        ),
        flush=True,
    )


def main() -> None:
    results = []
    for n in (8, 16, 32):
        t0 = time.time()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        r = subprocess.run(
            [sys.executable, __file__, "--worker", str(n)],
            capture_output=True, text=True, cwd=str(REPO), env=env,
            timeout=3600,
        )
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        ok = r.returncode == 0
        rec = {"n": n, "parity_s": round(time.time() - t0, 1), "ok": ok}
        if ok:
            rec.update(json.loads(line))
        else:
            rec["error"] = r.stderr[-2000:]
        print(json.dumps(rec), flush=True)
        if not ok:
            results.append(rec)
            continue

        t0 = time.time()
        env2 = dict(env)
        env2["GAUSPLAT_DRYRUN_TOY"] = "1"
        r2 = subprocess.run(
            [
                sys.executable,
                "-c",
                (
                    "import sys; sys.path.insert(0, '.');"
                    "from __graft_entry__ import dryrun_multichip;"
                    f"dryrun_multichip({n})"
                ),
            ],
            capture_output=True, text=True, cwd=str(REPO), env=env2,
            timeout=3600,
        )
        rec["dryrun_toy_ok"] = r2.returncode == 0
        rec["dryrun_s"] = round(time.time() - t0, 1)
        if r2.returncode != 0:
            rec["dryrun_error"] = r2.stderr[-2000:]
        print(json.dumps(rec), flush=True)
        results.append(rec)

    out = REPO / "MESH_SCALE_r05.json"
    out.write_text(json.dumps(results, indent=1) + "\n")
    print(f"wrote {out}")
    if not all(r.get("ok") and r.get("dryrun_toy_ok") for r in results):
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
