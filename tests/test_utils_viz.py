"""Tests for utils (IO, profiling) and the plotting suite (smoke)."""

import numpy as np
import pytest

import jax.numpy as jnp

from waveform_ot_tpu.utils import (
    StageTimer, benchmark, read_json, read_pickle, restore_checkpoint,
    save_checkpoint, write_json, write_pickle,
)


class TestIO:
    def test_pickle_roundtrip(self, tmp_path):
        f = tmp_path / "x.pkl"
        a = np.arange(5.0)
        write_pickle(f, ["a", "s"], [a, 3.5])
        out = read_pickle(f)
        np.testing.assert_array_equal(out["a"], a)
        assert out["s"] == 3.5

    def test_json_roundtrip_actually_json(self, tmp_path):
        # the reference's readjson reads pickle (bug); ours must read JSON
        f = tmp_path / "x.json"
        write_json(f, ["a", "s"], [np.arange(3.0), "hello"])
        out = read_json(f)
        assert out["a"] == [0.0, 1.0, 2.0]
        assert out["s"] == "hello"
        import json

        json.load(open(f))  # file is genuine JSON

    def test_checkpoint_roundtrip(self, tmp_path):
        tree = {"m": jnp.arange(4.0), "n": {"k": jnp.ones((2, 3))}}
        save_checkpoint(tmp_path / "ckpt", tree)
        out = restore_checkpoint(tmp_path / "ckpt", tree)
        np.testing.assert_array_equal(np.asarray(out["m"]),
                                      np.asarray(tree["m"]))
        np.testing.assert_array_equal(np.asarray(out["n"]["k"]),
                                      np.asarray(tree["n"]["k"]))


class TestProfiling:
    def test_benchmark(self):
        import jax

        f = jax.jit(lambda x: x * 2.0)
        dt = benchmark(f, jnp.ones(128), n_iter=5)
        assert dt > 0

    def test_stage_timer(self):
        st = StageTimer()
        st.start("a")
        _ = sum(range(1000))
        stages = st.stop()
        assert "a" in stages and stages["a"] >= 0


class TestInversionTrace:
    def test_misfit_per_iterate_first_match(self):
        from waveform_ot_tpu.inversion.trace import InversionTrace

        tr = InversionTrace()
        for i in range(6):
            tr.record_eval(np.array([float(i), 1.0]), 10.0 - i)
        # duplicate model with a different misfit: first occurrence wins
        # (reference findres scans in order and breaks, ricker_util.py:413)
        tr.record_eval(np.array([2.0, 1.0]), -99.0)
        tr.record_iterate(np.array([2.0, 1.0]))
        tr.record_iterate(np.array([5.0, 1.0]))
        tr.record_iterate(np.array([9.0, 9.0]))  # never evaluated -> skipped
        assert list(tr.misfit_per_iterate()) == [8.0, 5.0]


class TestViz:
    def test_plots_smoke(self, tmp_path, rng):
        import matplotlib

        matplotlib.use("Agg")
        from waveform_ot_tpu import viz
        from waveform_ot_tpu.ops import (
            FingerprintSpec, distance_field, grid_axes, make_density_1d,
            make_window, normalize_vertices, transport_plan_1d,
        )

        n = 12
        f = jnp.array(rng.random(n) + 0.1)
        g = jnp.array(rng.random(n) + 0.1)
        x = jnp.linspace(0.0, 1.0, n)
        src = make_density_1d(f, x)
        tgt = make_density_1d(g, x)
        viz.plot_wasser_panels(src, tgt, filename=tmp_path / "w.png")
        H = transport_plan_1d(f, x, g, x)
        viz.plot_transport_plan(H, filename=tmp_path / "h.png")

        t = np.linspace(0, 1, 20)
        w = np.sin(5 * t)
        win = make_window(0.0, 1.0, -1.5, 1.5)
        spec = FingerprintSpec(nu=12, ntg=20)
        verts = normalize_vertices(jnp.array(t), jnp.array(w), win)
        tg, ug = grid_axes(jnp.array(t), win, spec)
        fld = distance_field(verts, tg, ug, impl="jnp")
        viz.plot_fingerprint(fld.d, verts, tg, ug,
                             filename=tmp_path / "fp.png")
        viz.plot_rays(fld, verts, tg, ug, filename=tmp_path / "rays.png")
        viz.plot_marginals(jnp.exp(-fld.d / 0.04), tg, ug,
                           filename_prefix=str(tmp_path / "m"))
        viz.plot_misfit_trace([1.0, 0.1, 0.01],
                              filename=tmp_path / "tr.png")
        viz.plot_transport_frames(src, tgt, nframes=3,
                                  filename=tmp_path / "frames.png")
        s = rng.standard_normal((2, 3, 30))
        viz.plot_seismograms(s, np.arange(30.0),
                             filename=tmp_path / "seis.png")
        vals = rng.random((5, 6))
        viz.plot_misfit_surface(vals, np.arange(6), np.arange(5),
                                filename=tmp_path / "surf.png")
        xg, yg = np.meshgrid(np.linspace(-1, 1, 6), np.linspace(-1, 1, 5))
        viz.plot_misfit_section(vals, xg, yg,
                                filename=tmp_path / "sec.png")
        assert (tmp_path / "w.png").exists()
        assert (tmp_path / "surf.png").exists()

    def test_completion_plots_smoke(self, tmp_path, rng):
        # the remaining reference helpers: plotPDFsurface, plot_phi,
        # plot_rays_discrete, plot_2LS (FingerprintLib.py:642-830),
        # plotrickers + plotwfit panels (ricker_util.py:106-131,456-508),
        # full 2x2 misfit-section figure (loc_cmt_util.py:589-655)
        import matplotlib

        matplotlib.use("Agg")
        from waveform_ot_tpu import viz
        from waveform_ot_tpu.ops import (
            FingerprintSpec, density_from_distance, distance_field,
            grid_axes, make_window, normalize_vertices,
        )

        t = np.linspace(0, 1, 24)
        w = np.sin(5 * t) * np.exp(-t)
        win = make_window(0.0, 1.0, -1.5, 1.5)
        spec = FingerprintSpec(nu=14, ntg=24)
        verts = normalize_vertices(jnp.array(t), jnp.array(w), win)
        tg, ug = grid_axes(jnp.array(t), win, spec)
        fld = distance_field(verts, tg, ug, impl="jnp")
        pdf = density_from_distance(fld.d, 0.05, q=None)

        viz.plot_density_surface(pdf, tg, ug, ridge_t=np.asarray(verts)[:, 0],
                                 ridge_u=np.asarray(verts)[:, 1],
                                 filename=tmp_path / "surf3d.png")
        viz.plot_phi(np.asarray(verts)[:, 0], np.asarray(verts)[:, 1],
                     np.asarray(tg), np.asarray(ug),
                     filename=tmp_path / "phi.png")
        # nearest-vertex assignment for the discrete-ray plot
        tt, uu = np.meshgrid(np.asarray(tg), np.asarray(ug))
        p = np.stack([tt.ravel(), uu.ravel()], 1)
        v = np.asarray(verts)
        darg = np.argmin(((p[:, None, :] - v[None]) ** 2).sum(2), axis=1)
        viz.plot_rays_discrete(darg, v, tg, ug,
                               filename=tmp_path / "raysd.png")
        viz.plot_two_fingerprints(fld.d, verts, pdf, verts,
                                  titles=("distance", "density"),
                                  filename=tmp_path / "two.png")
        viz.plot_rickers(t, w, t, w + 0.1, tlim=(0, 1),
                         filename=tmp_path / "rick.png")
        mis = np.geomspace(1.0, 1e-4, 9)
        viz.plot_waveform_fit(t, w, t, w * 0.9, mis, it=4,
                              filename=tmp_path / "wfit.png")
        viz.plot_waveform_fit(t, w, t, w * 0.9, mis, it=4,
                              second=np.geomspace(2.0, 1e-2, 9),
                              filename=tmp_path / "wfit3.png")
        xg, yg = np.meshgrid(np.linspace(-40, 40, 7),
                             np.linspace(-40, 40, 7))
        slices = rng.random((4,) + xg.shape) + 0.1
        viz.plot_misfit_sections(slices, xg, yg, zg=[10, 12, 14, 16],
                                 ztrue=12.0, sol=(3.0, -2.0), mistype="OT",
                                 filename=tmp_path / "secs.png")
        viz.plot_misfit_sections(slices * 100, xg, yg, zg=[10, 12, 14, 16],
                                 ztrue=12.0, mistype="L2",
                                 filename=tmp_path / "secs_l2.png")
        for name in ("surf3d", "phi", "raysd", "two", "rick", "wfit",
                     "wfit3", "secs", "secs_l2"):
            assert (tmp_path / f"{name}.png").exists()
