import os

from exemplars_vc_tpu.config import Config, load_config

REF_INI = "/root/reference/config/config"


def test_defaults():
    cfg = Config()
    assert cfg.mcep.frame_length == 400
    assert cfg.mcep.hop_length == 80
    assert cfg.nmf.max_iter == 150
    assert cfg.data.use_stft


def test_load_reference_ini():
    if not os.path.isfile(REF_INI):
        return
    cfg = load_config(REF_INI)
    # values from the reference INI (config/config:8-48)
    assert cfg.data.src == "SF1"
    assert cfg.data.tar == "TM3"
    assert cfg.data.sr == 16000
    assert cfg.mcep.order == 25
    assert abs(cfg.mcep.alpha - 0.42) < 1e-12
    assert cfg.net.nb_lstm_layers == 2
    assert cfg.net.patience == 30
    assert cfg.misc.nb_file == 20
    assert abs(cfg.misc.cpu_rate - 0.6) < 1e-12


def test_overrides():
    cfg = load_config(overrides=["nmf.max_iter=50", "data.use_stft=false", "mcep.alpha=0.35"])
    assert cfg.nmf.max_iter == 50
    assert not cfg.data.use_stft
    assert abs(cfg.mcep.alpha - 0.35) < 1e-12


def test_cli_accepts_reference_ini(tmp_path, capsys):
    """The reference's own INI drives the CLI unchanged (MIGRATING.md claim)."""
    import json

    from exemplars_vc_tpu.pipelines.cli import main

    if not os.path.isfile(REF_INI):
        return
    if not os.path.isdir("/root/reference/data/SF1"):
        return
    main([
        "make-dict", "--config", REF_INI, "--data", "/root/reference/data",
        "--tar", "TF1",   # the INI's TM3 is not bundled
        "--store", str(tmp_path / "store"), "--nb-file", "2",
    ])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["pairs"] == 2
