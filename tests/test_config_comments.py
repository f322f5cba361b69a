"""Comment-tolerant JSON config parsing — the reference's apps read their
config files with nlohmann's ``skip_comments=true`` (reference:
samples/mlp_learning_an_image.cu:151), so reference config files containing
comments must load unchanged."""

import json

import numpy as np
import pytest

import tcnn_tpu as tc

COMMENTED = """
{
    // line comment with "quotes" and /* nested markers */
    "loss": {"otype": "RelativeL2"},   // trailing comment
    /* block comment
       spanning lines, with a "string" and a // marker */
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {"otype": "Identity", "scale": 1.0},
    "network": {
        "otype": "CutlassMLP",
        "n_neurons": 16, # hash-style comment
        "n_hidden_layers": 1
    }
}
"""


def test_loads_commented_config_and_builds():
    cfg = tc.loads_config(COMMENTED)
    assert cfg["loss"]["otype"] == "RelativeL2"
    assert cfg["network"]["n_neurons"] == 16
    model = tc.create_from_config(2, 3, cfg)
    x = np.random.default_rng(0).random((128, 2), np.float32)
    out = model.inference(x)
    assert out.shape == (128, 3)


def test_comment_markers_inside_strings_survive():
    text = '{"a": "no // comment", "b": "not /* block */", "c": "q\\"//x"}'
    assert tc.loads_config(text) == json.loads(text)
    # escaped backslash before the closing quote must not eat the quote
    text2 = '{"p": "back\\\\"} // tail'
    assert tc.loads_config(text2) == {"p": "back\\"}


def test_plain_json_unchanged():
    text = json.dumps({"x": [1, 2, 3], "y": {"z": "a/b"}})
    assert tc.strip_json_comments(text) == text


def test_unterminated_block_comment_is_not_json():
    with pytest.raises(ValueError):
        tc.loads_config('{"a": 1} /* unterminated')


def test_load_config_reads_file(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(COMMENTED)
    assert tc.load_config(p)["optimizer"]["otype"] == "Adam"
