import numpy as np

from exemplars_vc_tpu.io import read_wav, write_wav, load_speaker, stack_ragged, ArtifactStore
from exemplars_vc_tpu.io.store import pad_to_bucket


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 220 * t)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr
    assert y.shape == x.shape
    assert np.max(np.abs(y - x)) < 1.0 / 32000


def test_read_reference_wav(sf1_wav):
    x, sr = sf1_wav
    assert sr == 16000
    assert x.dtype == np.float64
    assert x.ndim == 1 and len(x) > sr  # at least 1 s
    assert np.max(np.abs(x)) <= 1.0


def test_load_speaker_cache(tmp_path):
    import os

    if not os.path.isdir("/root/reference/data/SF1"):
        return
    sigs, sr = load_speaker("/root/reference/data", "SF1", nb_file=3, cache_dir=str(tmp_path))
    assert len(sigs) == 3 and sr == 16000
    sigs2, _ = load_speaker("/root/reference/data", "SF1", nb_file=3, cache_dir=str(tmp_path))
    for a, b in zip(sigs, sigs2):
        np.testing.assert_array_equal(a, b)


def test_stack_ragged():
    arrays = [np.ones((10, 4)), np.ones((300, 4)), np.ones((129, 4))]
    out, lens = stack_ragged(arrays, bucket=128)
    assert out.shape == (3, 384, 4)
    assert lens.tolist() == [10, 300, 129]
    assert out[0, 10:].sum() == 0


def test_pad_to_bucket():
    x = np.ones((130, 3))
    p, n = pad_to_bucket(x, 128)
    assert p.shape == (256, 3) and n == 130


def test_artifact_store(tmp_path):
    store = ArtifactStore(str(tmp_path))
    assert not store.has("stage1")
    store.save("stage1", a=np.arange(5), b=np.eye(2))
    assert store.has("stage1")
    back = store.load("stage1")
    np.testing.assert_array_equal(back["a"], np.arange(5))
    store.save_json("meta", {"n": 3})
    assert store.load_json("meta")["n"] == 3
