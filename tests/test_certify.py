"""The real-weight fidelity battery must RUN end-to-end on disk checkpoints
(plumbing proven here on tiny synthetic ckpts) and its verdicts must be
calibrated: random/untrained weights FAIL the trained-weight invariants
(zero convs nonzero, invert→denoise fixed point), so a future real-weight
run that passes is meaningful evidence."""

import json

import jax.numpy as jnp
import numpy as np

from gaussctrl_tpu.certify import (
    check_alpha_schedule, check_sd_stack, run_battery)
from gaussctrl_tpu.diffusion.config import SDConfig

from tests.test_weights_disk import fake_ckpt_dirs  # noqa: F401  (fixture)
from tests.test_weights import tiny_params  # noqa: F401  (fixture dep)


def test_alpha_schedule_golden_ok():
    res = check_alpha_schedule()
    assert res["ok"], res


def test_sd_stack_battery_runs_on_disk_ckpts(fake_ckpt_dirs):  # noqa: F811
    sd_dir, cn_dir = fake_ckpt_dirs
    out = check_sd_stack(sd_dir, cn_dir, num_steps=2, cfg=SDConfig.tiny(),
                         dtype=jnp.float32)
    assert set(out) == {"vae_roundtrip", "controlnet_nonzero",
                        "controlnet_scale_response",
                        "invert_denoise_roundtrip"}
    for name, res in out.items():
        assert "error" not in res, (name, res)   # plumbing never crashes
    assert np.isfinite(out["vae_roundtrip"]["psnr"])
    # calibration: flax zero-init zero-convs -> an untrained controlnet is
    # correctly flagged (and consequently has no scale response)
    assert out["controlnet_nonzero"]["ok"] is False
    assert out["controlnet_scale_response"]["eps_delta_maxabs"] == 0.0
    assert np.isfinite(out["invert_denoise_roundtrip"]["latent_psnr"])


def test_run_battery_skips_missing_inputs():
    v = run_battery()
    assert v["checks"]["alpha_schedule"]["ok"]
    assert any("sd_stack" in s for s in v["skipped"])
    assert any("sam" in s for s in v["skipped"])
    assert any("dino" in s for s in v["skipped"])


def test_certify_cli_writes_verdict(tmp_path):
    from gaussctrl_tpu.cli.certify import main
    out = tmp_path / "v.json"
    rc = main(["--out", str(out)])
    assert rc == 0                      # only alpha check ran; it passes
    v = json.loads(out.read_text())
    assert v["all_ok"] and v["checks"]["alpha_schedule"]["ok"]


def test_mask_iou_check_plumbing():
    """check_mask_iou runs the full text->box->mask path and scores spatial
    agreement; with a stub masker the verdicts are calibrated: an in-box
    mask passes, a disjoint mask fails, no-box reports its reason."""
    from gaussctrl_tpu.certify import check_mask_iou

    class StubMasker:
        def __init__(self, box, mask_slice):
            self._box = np.asarray(box, np.float32)
            self._slice = mask_slice

        def proposer(self, imgs, prompt):
            return self._box[None]

        def __call__(self, imgs, prompt):
            m = np.zeros((1, 256, 256, 1), np.float32)
            if self._slice is not None:
                m[0][self._slice] = 1.0
            return jnp.asarray(m)

    good = check_mask_iou(masker=StubMasker(
        [64, 64, 192, 192], (slice(72, 184), slice(72, 184), 0)))
    assert good["ok"] and good["mask_iou"] > 0.5, good

    disjoint = check_mask_iou(masker=StubMasker(
        [64, 64, 192, 192], (slice(200, 250), slice(200, 250), 0)))
    assert not disjoint["ok"] and disjoint["mask_iou"] == 0.0

    nobox = check_mask_iou(masker=StubMasker([-1, -1, -1, -1], None))
    assert not nobox["ok"] and nobox["reason"] == "no box proposed"


def test_run_battery_skips_mask_iou_without_sam():
    v = run_battery()
    assert any("mask_iou" in s for s in v["skipped"])


def test_cross_view_edit_golden_runs_and_calibrates(fake_ckpt_dirs):  # noqa: F811
    """The two-view cross-view edit golden (VERDICT r4 #6) runs end-to-end
    on disk ckpts and reports the consistency gain; determinism is pinned
    (DDIM eta=0, no RNG — two runs must agree bitwise)."""
    from gaussctrl_tpu.certify import check_cross_view_edit
    sd_dir, cn_dir = fake_ckpt_dirs
    out = check_cross_view_edit(sd_dir, cn_dir, num_steps=2, guidance=5.0,
                                cfg=SDConfig.tiny(), dtype=jnp.float32)
    assert "error" not in out, out
    assert np.isfinite(out["consistency_gain"])
    assert out["xv_view_l2"] >= 0 and out["ind_view_l2"] >= 0
    out2 = check_cross_view_edit(sd_dir, cn_dir, num_steps=2, guidance=5.0,
                                 cfg=SDConfig.tiny(), dtype=jnp.float32)
    assert out == out2


def test_run_battery_includes_cross_view_edit_skip():
    v = run_battery()
    assert any("cross_view_edit" in s for s in v["skipped"])
