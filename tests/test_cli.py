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


def test_cli_rejects_unknown_decoder():
    with pytest.raises(SystemExit):
        main(["bench", "--code", "toric:3", "--decoder", "nope"])


def test_cli_rejects_unknown_code():
    with pytest.raises(SystemExit):
        main(["bench", "--code", "mystery:3"])
