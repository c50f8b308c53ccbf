"""YAML config + CLI merge (reference ``main.py:9-10`` OmegaConf merge).

Precedence must be: explicit CLI flag > YAML value > built-in default.
Pure parse-layer tests — no Ray session needed.
"""

import pytest

from video_features_ray.__main__ import _parse


def _write(tmp_path, text):
    p = tmp_path / "cfg.yml"
    p.write_text(text)
    return str(p)


def test_yaml_supplies_required_args(tmp_path):
    cfg = _write(tmp_path, """
input: /data/seq.parquet
out: /data/out
spec: i3d_like_default
num-cpus: 8
""")
    args = _parse(["extract", "--config", cfg])
    assert args.input == ["/data/seq.parquet"]   # str normalized to list
    assert args.out == "/data/out"
    assert args.spec == "i3d_like_default"
    assert args.num_cpus == 8
    assert args.target_rows == 250_000           # built-in default kept


def test_cli_flag_overrides_yaml(tmp_path):
    cfg = _write(tmp_path, "spec: i3d_like_default\nout: /data/out\n"
                           "input: [/a.parquet, /b.parquet]\n"
                           "target-rows: 1000\n")
    args = _parse(["extract", "--config", cfg, "--spec", "r21d_like_16_16",
                   "--target-rows", "77"])
    assert args.spec == "r21d_like_16_16"        # CLI wins
    assert args.target_rows == 77
    assert args.input == ["/a.parquet", "/b.parquet"]


def test_missing_required_still_errors(tmp_path):
    cfg = _write(tmp_path, "out: /data/out\n")
    with pytest.raises(SystemExit):
        _parse(["extract", "--config", cfg])     # no input/spec anywhere


def test_non_mapping_config_rejected(tmp_path):
    cfg = _write(tmp_path, "- a\n- b\n")
    with pytest.raises(SystemExit):
        _parse(["extract", "--config", cfg, "--input", "x", "--out", "y",
                "--spec", "i3d_like_default"])


def test_features_subcommand_reads_yaml(tmp_path):
    cfg = _write(tmp_path, "input: /e.parquet\nout: /o\nspan-us: 60000000\n")
    args = _parse(["features", "--config", cfg])
    assert args.cmd == "features"
    assert args.span_us == 60_000_000
    assert args.input == ["/e.parquet"]
