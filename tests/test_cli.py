"""CLI tests."""

import json

import pytest

from ldpcdecoders_tpu.cli import main


def test_cli_sweep(tmp_path, capsys):
    rc = main(
        [
            "sweep",
            "--code", "gallager:120,6,3",
            "--decoder", "bp",
            "--pers", "0.01,0.03",
            "--trials", "64",
            "--batch", "32",
            "--max-iters", "30",
            "--checkpoint", str(tmp_path / "ck.json"),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"0.01", "0.03"}
    assert out["0.01"]["trials"] == 64


def test_cli_bench(capsys):
    rc = main(
        [
            "bench",
            "--code", "toric:3",
            "--decoder", "minsum",
            "--batch", "64",
            "--max-iters", "30",
            "--per", "0.02",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["syndromes_per_s"] > 0
    # median-of-N methodology with dispersion (advisor finding: a single
    # timed call is dispatch-noise-bound)
    assert out["reps"] == 5
    assert out["time_min_ms"] <= out["time_median_ms"] <= out["time_max_ms"]
    assert out["spread_pct"] >= 0
    assert 0 <= out["converged_fraction"] <= 1
    assert out["mean_iters"] > 0


def test_cli_bench_layered(capsys):
    rc = main(
        [
            "bench",
            "--code", "gallager:120,6,3",
            "--decoder", "layered_minsum",
            "--batch", "32",
            "--max-iters", "20",
            "--reps", "2",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["decoder"] == "layered_minsum" and out["reps"] == 2


def test_cli_rejects_unknown_decoder():
    with pytest.raises(SystemExit):
        main(["bench", "--code", "toric:3", "--decoder", "nope"])


def test_cli_rejects_unknown_code():
    with pytest.raises(SystemExit):
        main(["bench", "--code", "mystery:3"])


def test_cli_mixed_sweep(capsys):
    from ldpcdecoders_tpu.cli import main

    rc = main([
        "sweep", "--code", "gallager:120,6,3",
        "--pers", "0.005", "--erasure-rates", "0.02,0.1",
        "--trials", "64", "--batch", "32", "--max-iters", "30",
    ])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"0.02", "0.1"}
    assert out["0.1"]["trials"] == 64
    assert out["0.1"]["syndrome_mismatch_rate"] == 0.0  # OSD completion


def test_cli_mixed_sweep_single_flip_rate_enforced():
    import pytest as _p
    from ldpcdecoders_tpu.cli import main

    with _p.raises(SystemExit, match="one --pers"):
        main([
            "sweep", "--code", "gallager:120,6,3",
            "--pers", "0.005,0.01", "--erasure-rates", "0.1",
            "--trials", "8",
        ])
    # flags the mixed path cannot honor are rejected, not dropped
    with _p.raises(SystemExit, match="MixedChannelDecoder"):
        main([
            "sweep", "--code", "gallager:120,6,3", "--pers", "0.005",
            "--erasure-rates", "0.1", "--trials", "8",
            "--decoder", "minsum",
        ])


def test_cli_train_then_bench_neural(tmp_path, capsys):
    """train writes a schedule; bench consumes it via --decoder
    neural_minsum --schedule-file."""
    import json
    from ldpcdecoders_tpu.cli import main

    sched = str(tmp_path / "sched.npz")
    rc = main([
        "train", "--code", "gallager:120,6,3", "--max-iters", "6",
        "--per", "0.04", "--steps", "12", "--train-batch", "32",
        "--out", sched,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["loss_last"] < out["loss_first"]
    rc = main([
        "bench", "--code", "gallager:120,6,3", "--decoder", "neural_minsum",
        "--schedule-file", sched, "--max-iters", "6", "--batch", "32",
        "--reps", "2",
    ])
    assert rc == 0
    bench = json.loads(capsys.readouterr().out)
    assert bench["decoder"] == "neural_minsum" and bench["syndromes_per_s"] > 0


def test_cli_logical_spacetime(capsys):
    rc = main(
        [
            "logical",
            "--code", "toric:3",
            "--pers", "0.01",
            "--trials", "64",
            "--batch", "64",
            "--max-iters", "30",
            "--rounds", "2",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    pt = out["0.01"]
    assert pt["trials"] == 64
    assert pt["rounds"] == 2
    assert 0.0 <= pt["any_logical_rate"] <= 1.0


def test_cli_logical_single_round(capsys):
    rc = main(
        [
            "logical",
            "--code", "toric:3",
            "--pers", "0.01",
            "--trials", "64",
            "--batch", "64",
            "--max-iters", "30",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["0.01"]["trials"] == 64
    assert "throughput_pairs_per_s" in out["0.01"]


def test_cli_logical_flag_validation():
    with pytest.raises(SystemExit, match="rounds > 1"):
        main(["logical", "--code", "toric:3", "--pers", "0.01",
              "--trials", "32", "--meas-error-rate", "0.01"])
    with pytest.raises(SystemExit, match="rounds=1"):
        main(["logical", "--code", "toric:3", "--pers", "0.01",
              "--trials", "32", "--rounds", "2", "--loss-rate", "0.1"])
    with pytest.raises(SystemExit, match="CSS pair"):
        main(["logical", "--code", "gallager:120,6,3", "--pers", "0.01",
              "--trials", "32"])
