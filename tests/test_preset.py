"""The `quality` preset (config.PRESETS): plumbing + CI quality gate.

The preset is the round-5 JOINT lever sweep's winner — KL β-loss + 4-warp
VTLP dictionary augmentation + 2-frame H box filter (tools/sweep_quality.py
swept the compositions; prune/sharpen/densify/more-warps measured worse
jointly). The gate converts one leave-one-out fold and requires the preset
to beat the plain KL quality config on it, so a regression in any of the
composed levers (or in the preset definition drifting from the swept
winner) fails CI.
"""

import os

import numpy as np
import pytest

from exemplars_vc_tpu.config import PRESETS, load_config

DATA = "/root/reference/data"


class TestPresetPlumbing:
    def test_quality_preset_fields(self):
        cfg = load_config(preset="quality")
        assert cfg.nmf.beta_loss == "kullback-leibler"
        assert cfg.nmf.h_smooth == 2
        assert cfg.nmf.context_frames == 0
        assert cfg.data.dict_augment_warps == "0.9,0.95,1.05,1.1"

    def test_user_override_wins_over_preset(self):
        cfg = load_config(overrides=["nmf.h_smooth=0"], preset="quality")
        assert cfg.nmf.h_smooth == 0
        assert cfg.nmf.beta_loss == "kullback-leibler"

    def test_unknown_preset_raises(self):
        with pytest.raises(KeyError):
            load_config(preset="nope")

    def test_eval_config_matches_preset(self):
        """The LOO eval config `stft_preset` must track config.PRESETS."""
        from exemplars_vc_tpu.pipelines.evaluate import lever_configs

        base = load_config(overrides=["data.tar=TF1"])
        c = lever_configs(base)["stft_preset"]
        p = load_config(preset="quality")
        assert c.nmf.beta_loss == p.nmf.beta_loss
        assert c.nmf.h_smooth == p.nmf.h_smooth
        assert c.data.dict_augment_warps == p.data.dict_augment_warps


@pytest.mark.skipif(not os.path.isdir(os.path.join(DATA, "SF1")),
                    reason="bundled corpus not present")
class TestPresetQualityGate:
    def test_preset_beats_plain_quality_on_fold(self, tmp_path):
        """One LOO fold (100003 — not a sweep fold): preset MCD must not be
        worse than the plain stft_quality config."""
        from exemplars_vc_tpu.io import ArtifactStore, read_wav
        from exemplars_vc_tpu.pipelines.convert import (
            convert_utterance,
            mcd_between_signals,
        )
        from exemplars_vc_tpu.pipelines.evaluate import (
            _configs,
            _fold_data_dir,
            lever_configs,
        )

        utt = "100003"
        base = load_config(overrides=["data.tar=TF1", "misc.nb_file=8"])
        fold_data = _fold_data_dir(str(tmp_path), DATA, base, utt)
        store = ArtifactStore(str(tmp_path / "store"))
        src_wav = os.path.join(DATA, "SF1", f"{utt}.wav")
        tar_wav = os.path.join(DATA, "TF1", f"{utt}.wav")

        quality = _configs(base)["stft_quality"]
        preset = lever_configs(base)["stft_preset"]
        mcds = {}
        for name, c in (("quality", quality), ("preset", preset)):
            res = convert_utterance(c, store, fold_data, src_wav,
                                    synth_iters=30, reference_wav=tar_wav)
            mcds[name] = float(res.mcd_vs_reference)
            assert np.isfinite(mcds[name])
        # swept margin on this fold is ~0.1 dB; allow noise but catch real
        # regressions of the composed levers
        assert mcds["preset"] <= mcds["quality"] + 0.05, mcds
