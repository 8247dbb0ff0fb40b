"""CLI surface tests via click's test runner (fast, no device work)."""

import numpy as np
import pytest
from click.testing import CliRunner


def test_train_dry_run(tmp_path):
    from vivid_tpu.cli.train_nvs import cmdline
    r = CliRunner().invoke(cmdline, [
        "--preset=vivid-base", "--data=/nonexistent", "--dry-run",
        f"--outdir={tmp_path}"])
    assert r.exit_code == 0, r.output
    assert "Dry run; exiting." in r.output
    assert '"batch_size": 1024' in r.output


def test_train_invalid_preset(tmp_path):
    from vivid_tpu.cli.train_nvs import cmdline
    r = CliRunner().invoke(cmdline, [
        "--preset=nope", "--data=/x", "--dry-run", f"--outdir={tmp_path}"])
    assert r.exit_code != 0
    assert "Invalid configuration preset" in r.output


def test_generate_requires_net():
    from vivid_tpu.cli.generate_images import cmdline
    r = CliRunner().invoke(cmdline, ["--data=/x", "--outdir=/tmp/o"])
    assert r.exit_code != 0
    assert "--preset or --net" in r.output


def test_generate_guidance_requires_gnet():
    from vivid_tpu.cli.generate_images import cmdline
    r = CliRunner().invoke(cmdline, ["--net=/x.pkl", "--data=/x",
                                     "--outdir=/tmp/o", "--guidance=1.5"])
    assert r.exit_code != 0
    assert "--gnet" in r.output


def test_parse_int_list():
    from vivid_tpu.cli.generate_images import parse_int_list
    assert parse_int_list("1,2,5-8") == [1, 2, 5, 6, 7, 8]
    assert parse_int_list([3, 4]) == [3, 4]


def test_metrics_invalid_metric():
    from vivid_tpu.cli.calculate_metrics import parse_metric_list
    import click
    with pytest.raises(click.ClickException):
        parse_metric_list("fid,bogus")
    assert parse_metric_list("fid,psnr") == ["fid", "psnr"]


def test_open_url_contract(tmp_path):
    from vivid_tpu.core.util import open_url, is_url, set_cache_dir
    p = tmp_path / "weights.bin"
    p.write_bytes(b"abc")
    assert open_url(str(p)).read() == b"abc"
    assert open_url(f"file://{p}").read() == b"abc"
    assert not is_url(str(p))
    assert is_url("https://example.com/x.pkl")
    set_cache_dir(str(tmp_path / "cache"))
    with pytest.raises(FileNotFoundError) as err:
        open_url("https://example.com/model.pkl")
    assert "Pre-seed" in str(err.value)
    # Pre-seeded by bare name resolves.
    import os
    bare = tmp_path / "cache" / "downloads" / "model.pkl"
    os.makedirs(bare.parent, exist_ok=True)
    bare.write_bytes(b"xyz")
    assert open_url("https://example.com/model.pkl").read() == b"xyz"


def test_async_checkpoint(tmp_path):
    from vivid_tpu.core.checkpoint import CheckpointIO
    io = CheckpointIO(state={"x": np.ones(4)})
    path = str(tmp_path / "training-state-0000001.pt")
    io.save(path, async_=True)
    io.wait()
    import os, pickle
    assert os.path.exists(path)
    with open(path, "rb") as f:
        assert np.array_equal(pickle.load(f)["state"]["x"], np.ones(4))


def test_code_snapshot_provenance(tmp_path):
    """Launch provenance (reference copies .py files into run_dir/code,
    train_nvs.py:123-130): provenance.json + a source tarball of the package."""
    import json
    import os
    import tarfile
    from vivid_tpu.cli.train_nvs import save_code_snapshot
    run_dir = str(tmp_path / "experiments")
    os.makedirs(run_dir)
    save_code_snapshot(run_dir)
    with open(os.path.join(run_dir, "code", "provenance.json")) as f:
        prov = json.load(f)
    assert "argv" in prov and "python" in prov
    with tarfile.open(os.path.join(run_dir, "code", "source.tar.gz")) as tar:
        names = tar.getnames()
    assert any(n.endswith("vivid_tpu/train/loop.py") for n in names)
    assert not any("__pycache__" in n for n in names)
