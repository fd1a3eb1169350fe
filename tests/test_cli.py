"""CLI surface: python -m openfdcm_tpu {match,sweep,info}."""
import json
import os

import numpy as np

import openfdcm_tpu as of
from openfdcm_tpu.__main__ import main
from tests.utils import create_lines, make_rotation, apply_transform


def _write_assets(tmp_path, n_tmpl=3):
    tdir = tmp_path / "templates"
    tdir.mkdir()
    templates = []
    for i in range(n_tmpl):
        t = np.asarray(create_lines(5 + i, 40.0 + 5.0 * i))
        of.write(str(tdir / f"t{i}.tmpl"), t)
        templates.append(t)
    mat = np.concatenate([make_rotation(0.4), np.full((2, 1), 6.0,
                                                      np.float32)], axis=1)
    scene = apply_transform(templates[1], mat)
    of.write(str(tmp_path / "scene_0.scene"), scene)
    return tdir, tmp_path / "scene_0.scene"


def test_cli_info(tmp_path, capsys):
    tdir, _ = _write_assets(tmp_path)
    assert main(["info", str(tdir / "t0.tmpl")]) == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["lines"] == 5 and rec["total_length"] > 0


def test_cli_match(tmp_path, capsys):
    tdir, scene = _write_assets(tmp_path)
    assert main(["match", "--templates", str(tdir), "--scene", str(scene),
                 "--depth", "2", "--top-k", "3"]) == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
           if l.startswith("{")]
    assert 1 <= len(out) <= 3
    assert all(0 <= r["tmpl_idx"] < 3 for r in out)
    assert out[0]["score"] <= out[-1]["score"] + 1e-9   # ranked ascending


def test_cli_sweep(tmp_path, capsys):
    tdir, scene = _write_assets(tmp_path)
    assert main(["sweep", "--templates", str(tdir), "--scenes",
                 str(scene), "--state", str(tmp_path / "state"),
                 "--depth", "2", "--top-k", "2", "--chunk-size", "2"]) == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
           if l.startswith("{")]
    assert len(out) == 1 and out[0]["best_template"] is not None
    assert out[0]["n_matches"] == 2
    assert os.path.exists(tmp_path / "state" / "state.json")
