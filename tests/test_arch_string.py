"""Checkpoint arch-string handling (VERDICT r3 item 8).

The released .pth files carry their model-constructor call as a pickled
STRING which the reference `eval()`s (mast3r/model.py:21-37).  Our loader
must parse it — extracting the structural config — and refuse anything
that is not a constants-only constructor call.  Plus a turn-key smoke: a
synthetic tiny .pth (state_dict + args.model string, the released layout)
driven through the real CLI via --checkpoint.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/thirdparty/mast3r"

RELEASED_ARCH = (
    "AsymmetricMASt3R(pos_embed='RoPE100', patch_embed_cls='ManyAR_PatchEmbed',"
    " img_size=(512, 512), head_type='catmlp+dpt', output_mode='pts3d+desc24',"
    " depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf),"
    " enc_embed_dim=1024, enc_depth=24, enc_num_heads=16, dec_embed_dim=768,"
    " dec_depth=12, dec_num_heads=12, two_confs=True,"
    " desc_conf_mode=('exp', 0, inf))"
)

TINY_ARCH = (
    "AsymmetricMASt3R(pos_embed='RoPE100', patch_embed_cls='ManyAR_PatchEmbed',"
    " img_size=(512, 512), head_type='catmlp+dpt', output_mode='pts3d+desc24',"
    " depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf),"
    " enc_embed_dim=64, enc_depth=2, enc_num_heads=2, dec_embed_dim=48,"
    " dec_depth=12, dec_num_heads=4, two_confs=True,"
    " desc_conf_mode=('exp', 0, inf))"
)


def test_parse_released_arch_string():
    from mast3r_slam_tpu.models.convert import config_from_arch, parse_arch_string

    parsed = parse_arch_string(RELEASED_ARCH)
    assert parsed["class_name"] == "AsymmetricMASt3R"
    kw = parsed["kwargs"]
    assert kw["depth_mode"] == ("exp", -float("inf"), float("inf"))
    assert kw["two_confs"] is True

    cfg = config_from_arch(RELEASED_ARCH)
    assert cfg.enc_embed_dim == 1024 and cfg.enc_depth == 24
    assert cfg.dec_embed_dim == 768 and cfg.dec_depth == 12
    assert cfg.enc_num_heads == 16 and cfg.dec_num_heads == 12
    assert cfg.rope_base == 100.0
    assert cfg.desc_dim == 24
    assert cfg.conf_offset == 1.0 and cfg.desc_conf_offset == 0.0


def test_parse_refuses_non_literal_code():
    from mast3r_slam_tpu.models.convert import parse_arch_string

    with pytest.raises(ValueError):
        parse_arch_string("AsymmetricMASt3R(x=__import__('os').system('id'))")
    with pytest.raises((ValueError, SyntaxError)):
        parse_arch_string("__import__('os').system('id')")
    with pytest.raises(ValueError):
        parse_arch_string("AsymmetricMASt3R(enc_embed_dim=1024+0)")


def test_config_from_arch_rejects_unknown_modes():
    from mast3r_slam_tpu.models.convert import config_from_arch

    with pytest.raises(ValueError):
        config_from_arch("M(output_mode='pts3d')")  # no desc head
    with pytest.raises(ValueError):
        config_from_arch("M(conf_mode=('sigmoid', 0, 1))")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_checkpoint_pth_smoke_through_cli(tmp_path_factory, monkeypatch):
    """Released-.pth layout (state_dict + args.model arch string) -> one CLI
    command to a trajectory: the turn-key weights-drop path."""
    cv2 = pytest.importorskip("cv2")
    for p in [REF, REF + "/dust3r", REF + "/dust3r/croco"]:
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch

    torch.manual_seed(0)
    from mast3r.model import AsymmetricMASt3R

    inf = float("inf")
    model = AsymmetricMASt3R(
        output_mode="pts3d+desc24",
        head_type="catmlp+dpt",
        depth_mode=("exp", -inf, inf),
        conf_mode=("exp", 1, inf),
        desc_conf_mode=("exp", 0, inf),
        two_confs=True,
        landscape_only=False,
        patch_embed_cls="PatchEmbedDust3R",
        img_size=(64, 96),
        patch_size=16,
        enc_embed_dim=64,
        enc_depth=2,
        enc_num_heads=2,
        dec_embed_dim=48,
        dec_depth=12,
        dec_num_heads=4,
        pos_embed="RoPE100",
    )
    model.eval()

    tmp = tmp_path_factory.mktemp("ckpt_smoke")
    pth = tmp / "MASt3R_ViTTiny_TestDecoder_512_catmlpdpt_metric.pth"
    torch.save(
        {
            "model": model.state_dict(),
            "args": types.SimpleNamespace(model=TINY_ARCH),
        },
        pth,
    )

    rgb = tmp / "rgb"
    rgb.mkdir()
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(96, 128, 3)).astype(np.uint8)
    for i in range(3):
        cv2.imwrite(str(rgb / f"{i:04d}.png"), np.roll(base, i * 3, axis=1))

    from mast3r_slam_tpu.slam import run as run_mod

    monkeypatch.chdir(tmp)
    run_mod.main([
        "--dataset", str(rgb),
        "--config", "base",
        "--model-preset", "tiny",
        "--checkpoint", str(pth),
        "--save-as", "ckpt_smoke",
        "--no-viz",
    ])
    traj = tmp / "logs" / "ckpt_smoke" / "rgb.txt"
    assert traj.is_file()
    lines = traj.read_text().strip().splitlines()
    assert lines and all(len(l.split()) == 8 for l in lines)
