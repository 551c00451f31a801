"""bench.py plumbing smoke test: a tiny 3-level model family through all
three measured phases on CPU must emit the one-line JSON with a positive
value (guards the driver-facing artifact against bitrot)."""

import json
import os

import pytest

from jukebox_tpu import hparams
from jukebox_tpu.models import make_models


_SMOKE_VQVAE = dict(
    sample_length=0, levels=3, downs_t=(2, 1, 1), strides_t=(2, 2, 2),
    emb_width=16, l_bins=32, l_mu=0.99, commit=0.02, width=8, depth=1,
    m_conv=1.0, dilation_growth_rate=1, sr=8000,
)
_SMOKE_UP = dict(
    level=1, n_ctx=64, prior_width=32, prior_depth=6, heads=2, attn_order=2,
    blocks=8, init_scale=0.4, cond_width=16, cond_depth=1,
    cond_dilation_growth_rate=1, cond_dilation_cycle=None, use_tokens=False,
    labels=True, y_bins=(120, 4111), t_bins=16, max_bow_genre_size=5,
    n_vocab=80, min_duration=0.0, max_duration=600.0, sr=8000,
)
_SMOKE_TOP = dict(
    level=2, n_ctx=32, prior_width=32, prior_depth=6, heads=2, attn_order=12,
    blocks=8, init_scale=0.2, labels=True, labels_v3=True, y_bins=(604, 7898),
    t_bins=16, max_bow_genre_size=1, n_vocab=79, min_duration=0.0,
    max_duration=600.0, use_tokens=True, n_tokens=8, prime_loss_fraction=0.4,
    single_enc_dec=True, sr=8000,
)


def test_bench_smoke(tmp_path, monkeypatch, capsys):
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_vqvae",
                        dict(_SMOKE_VQVAE))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_up",
                        dict(_SMOKE_UP))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_top",
                        dict(_SMOKE_TOP))
    monkeypatch.setitem(make_models.MODELS, "bench_smoke",
                        ("bench_smoke_vqvae", "bench_smoke_up",
                         "bench_smoke_up", "bench_smoke_top"))
    monkeypatch.setenv("BENCH_MODEL", "bench_smoke")
    monkeypatch.setenv("BENCH_ALLOW_CPU", "1")
    monkeypatch.setenv("BENCH_N_SAMPLES", "2")
    monkeypatch.setenv("BENCH_BUDGET_S", "600")
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.chdir(tmp_path)

    import bench
    bench.main()

    out = capsys.readouterr().out.strip().splitlines()
    line = json.loads(out[-1])
    assert line["value"] > 0
    assert line["unit"] == "audio_sec/chip_hour"
    assert line["vs_baseline"] == pytest.approx(line["value"] / 0.11, rel=1e-2)
    # non-default models write a per-model details file (bench.py keeps
    # bench_details.json for 1b_lyrics so driver rows aren't clobbered)
    details = json.loads(
        (tmp_path / "bench_details_bench.json").read_text())
    assert set(details["phases"]) == {"top", "up_anc", "up_primed"}


def test_bench_smoke_cascade_only(tmp_path, monkeypatch, capsys):
    """BENCH_PHASES=none + BENCH_FULL_CASCADE=1 (the cold/warm wall-clock
    A/B mode): the headline falls back to the measured end-to-end cascade
    rate and the details row carries provenance."""
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_vqvae",
                        dict(_SMOKE_VQVAE))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_up",
                        dict(_SMOKE_UP))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_top",
                        dict(_SMOKE_TOP))
    monkeypatch.setitem(make_models.MODELS, "bench_smoke",
                        ("bench_smoke_vqvae", "bench_smoke_up",
                         "bench_smoke_up", "bench_smoke_top"))
    monkeypatch.setenv("BENCH_MODEL", "bench_smoke")
    monkeypatch.setenv("BENCH_ALLOW_CPU", "1")
    monkeypatch.setenv("BENCH_N_SAMPLES", "2")
    monkeypatch.setenv("BENCH_BUDGET_S", "600")
    monkeypatch.setenv("BENCH_PHASES", "none")
    monkeypatch.setenv("BENCH_FULL_CASCADE", "1")
    monkeypatch.setenv("BENCH_CASCADE_ROW", "full_cascade_cold")
    monkeypatch.setenv("BENCH_INT8", "0")
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.chdir(tmp_path)

    import bench
    bench.main()

    out = capsys.readouterr().out.strip().splitlines()
    line = json.loads(out[-1])
    assert line["value"] > 0
    assert "measured_full_cascade" in line["metric"]
    details = json.loads(
        (tmp_path / "bench_details_bench.json").read_text())
    row = details["full_cascade_cold"]
    assert row["wall_s"] > 0 and row["audio_sec_per_chip_hour"] > 0
    assert "git_sha" in row and "measured_at" in row
    assert not row.get("carried_forward")


def test_bench_smoke_phase_failure_persists(tmp_path, monkeypatch, capsys):
    """A failing phase must be recorded as an error row and must not take
    the other phases' measurements down with it (the r4 5b bench OOM'd the
    top phase and lost the whole run). The headline extrapolation still
    refuses without a measured top phase — but only AFTER persisting what
    the run did collect."""
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_vqvae",
                        dict(_SMOKE_VQVAE))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_up",
                        dict(_SMOKE_UP))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_top",
                        dict(_SMOKE_TOP))
    monkeypatch.setitem(make_models.MODELS, "bench_smoke",
                        ("bench_smoke_vqvae", "bench_smoke_up",
                         "bench_smoke_up", "bench_smoke_top"))
    monkeypatch.setenv("BENCH_MODEL", "bench_smoke")
    monkeypatch.setenv("BENCH_ALLOW_CPU", "1")
    monkeypatch.setenv("BENCH_N_SAMPLES", "2")
    monkeypatch.setenv("BENCH_BUDGET_S", "600")
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.chdir(tmp_path)

    real_make_prior = make_models.make_prior

    def failing_top_make_prior(hps, vqvae):
        if hps.level == 2:  # the top prior of the 3-level smoke family
            raise RuntimeError("RESOURCE_EXHAUSTED: injected top-phase OOM")
        return real_make_prior(hps, vqvae)

    monkeypatch.setattr(make_models, "make_prior", failing_top_make_prior)

    import bench
    with pytest.raises(RuntimeError, match="top phase missing"):
        bench.main()

    details = json.loads(
        (tmp_path / "bench_details_bench.json").read_text())
    # the full message is kept (an OOM's byte counts are the diagnosis)
    assert details["phases"]["top"]["error"].startswith("RESOURCE_EXHAUSTED")
    for name in ("up_anc", "up_primed"):
        assert details["phases"][name]["tok_per_s"] > 0


def test_bench_smoke_top_batch_steps_down_on_oom(tmp_path, monkeypatch,
                                                 capsys):
    """The top phase steps its batch down in-process on a persistent OOM
    (the r4 5b top OOM'd at the shipped bs=16 default; each full-process
    retry repaid host init + staging). An injected ceiling at bs>2 must
    yield a measured bs=2 row that records the failed size."""
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_vqvae",
                        dict(_SMOKE_VQVAE))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_up",
                        dict(_SMOKE_UP))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_top",
                        dict(_SMOKE_TOP))
    monkeypatch.setitem(make_models.MODELS, "bench_smoke",
                        ("bench_smoke_vqvae", "bench_smoke_up",
                         "bench_smoke_up", "bench_smoke_top"))
    monkeypatch.setenv("BENCH_MODEL", "bench_smoke")
    monkeypatch.setenv("BENCH_ALLOW_CPU", "1")
    monkeypatch.setenv("BENCH_N_SAMPLES", "4")
    monkeypatch.setenv("BENCH_BS_TOP", "4")
    monkeypatch.setenv("BENCH_BUDGET_S", "600")
    monkeypatch.setenv("BENCH_PHASES", "top")
    monkeypatch.setenv("BENCH_FAKE_OOM_ABOVE_BS", "2")
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.chdir(tmp_path)

    import bench
    bench.main()

    details = json.loads(
        (tmp_path / "bench_details_bench.json").read_text())
    row = details["phases"]["top"]
    assert row["bs"] == 2 and row["tok_per_s"] > 0
    # the default size gets one settled retry before stepping down (a
    # transient OOM right after a freed attempt is indistinguishable from
    # a capacity OOM in the axon error text — measured, r5 probe walk);
    # a PERSISTENT ceiling therefore records the top size twice
    assert [o["bs"] for o in row["oom_at"]] == [4, 4]
    assert "RESOURCE_EXHAUSTED" in row["oom_at"][0]["error"]


def test_bench_tunnel_gate_aborts_sick_run(tmp_path, monkeypatch):
    """A sick transport must produce a diagnostic row in minutes, not a
    dead round (the r4b 5b run measured H2D 53 MB/s at +449s and then
    burned the whole 3600s budget into it). Below the threshold with the
    gate window exhausted, bench aborts with a tunnel_sick row."""
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_vqvae",
                        dict(_SMOKE_VQVAE))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_up",
                        dict(_SMOKE_UP))
    monkeypatch.setitem(hparams.HPARAMS_REGISTRY, "bench_smoke_top",
                        dict(_SMOKE_TOP))
    monkeypatch.setitem(make_models.MODELS, "bench_smoke",
                        ("bench_smoke_vqvae", "bench_smoke_up",
                         "bench_smoke_up", "bench_smoke_top"))
    monkeypatch.setenv("BENCH_MODEL", "bench_smoke")
    monkeypatch.setenv("BENCH_ALLOW_CPU", "1")
    monkeypatch.setenv("BENCH_N_SAMPLES", "2")
    monkeypatch.setenv("BENCH_BUDGET_S", "600")
    monkeypatch.setenv("BENCH_FAKE_TUNNEL_H2D", "10")
    monkeypatch.setenv("BENCH_TUNNEL_WAIT_S", "0")
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.chdir(tmp_path)

    import bench
    with pytest.raises(RuntimeError, match="tunnel sick"):
        bench.main()

    details = json.loads(
        (tmp_path / "bench_details_bench.json").read_text())
    row = details["tunnel_sick"]
    assert row["probes"][0]["h2d_mb_s"] == 10
    assert row["threshold_h2d_mb_s"] == 200
    assert "git_sha" in row and "measured_at" in row
