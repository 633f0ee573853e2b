"""Prefetching dataset loader tests."""
import numpy as np
import pytest

from gomel_tpu.core.config import GomelError
from gomel_tpu.io import flac as flacmod
from gomel_tpu.io.audio import save_wav
from gomel_tpu.io.dataset import (AudioDataset, batched_buffers,
                                  list_audio_files, load_audio)


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        n = 1000 + 500 * i
        buf = rng.uniform(-0.5, 0.5, n)
        if i % 2 == 0:
            p = d / f"u{i}.wav"
            save_wav(str(p), buf, 16000)
        else:
            p = d / f"u{i}.flac"
            flacmod.write_flac(str(p), buf, 16000)
        paths.append(str(p))
    (d / "notes.txt").write_text("ignore me")
    return d, sorted(paths)


def test_list_audio_files(audio_dir):
    d, paths = audio_dir
    assert list_audio_files(str(d)) == paths
    assert list_audio_files(str(d), recursive=False) == paths


def test_iterates_in_order_with_prefetch(audio_dir):
    d, paths = audio_dir
    ds = AudioDataset(paths, num_workers=3, prefetch=2)
    seen = list(ds)
    assert [p for p, _, _ in seen] == paths
    for p, buf, sr in seen:
        assert sr == 16000
        assert buf.ndim == 1 and len(buf) >= 1000


def test_wav_and_flac_agree(tmp_path):
    # identical content written to both formats must decode identically
    rng = np.random.default_rng(7)
    buf = np.clip(rng.standard_normal(4000) * 0.3, -0.999, 0.999)
    wav_p = str(tmp_path / "same.wav")
    flac_p = str(tmp_path / "same.flac")
    save_wav(wav_p, buf, 16000)
    flacmod.write_flac(flac_p, buf, 16000)
    wav_buf, wav_sr = load_audio(wav_p)
    flac_buf, flac_sr = load_audio(flac_p)
    assert wav_sr == flac_sr == 16000
    np.testing.assert_allclose(wav_buf, flac_buf, atol=2.0 / 32768)


def test_error_skip_and_raise(audio_dir, tmp_path):
    d, paths = audio_dir
    bad = str(tmp_path / "bad.flac")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    ds = AudioDataset([paths[0], bad, paths[1]], on_error="skip")
    got = [p for p, _, _ in ds]
    assert got == [paths[0], paths[1]]
    ds2 = AudioDataset([bad], on_error="raise")
    with pytest.raises(GomelError):
        list(ds2)


def test_transform_and_batching(audio_dir):
    d, paths = audio_dir
    ds = AudioDataset(paths, transform=lambda b, sr: b * 2.0, num_workers=2)
    batches = list(batched_buffers(ds, 2))
    assert [len(b) for b in batches] == [2, 2, 1]


def test_end_to_end_with_batched_mel(audio_dir):
    d, paths = audio_dir
    from gomel_tpu.core.config import MelConfig
    from gomel_tpu.parallel.batch import BatchedMel
    bm = BatchedMel(MelConfig(num_mels=16, window=64, resolut=256))
    ds = AudioDataset(paths)
    utts = [buf.astype(np.float32) for _, buf, _ in ds]
    results = bm.encode_buckets(utts)
    covered = sorted(i for bucket, _ in results for i in bucket.indices)
    assert covered == list(range(len(paths)))


def test_mel_tensor_hooks(audio_dir):
    d, paths = audio_dir
    from gomel_tpu import Mel, MelConfig
    m = Mel(MelConfig(num_mels=16, window=64, resolut=256))
    wavs = [p for p in paths if p.endswith(".wav")]
    flacs = [p for p in paths if p.endswith(".flac")]
    t1 = m.to_tensor_wav(wavs[0])
    t2 = m.to_tensor_flac(flacs[0])
    assert t1.shape[1:] == (16, 2) and t2.shape[1:] == (16, 2)


def test_shard_files_for_process():
    from gomel_tpu.io.dataset import shard_files_for_process
    files = [f"f{i}" for i in range(10)]
    # explicit topology: strided split, disjoint cover, near-equal counts
    shards = [shard_files_for_process(files, p, 3) for p in range(3)]
    assert sorted(sum(shards, [])) == sorted(files)
    assert [len(s) for s in shards] == [4, 3, 3]
    assert shards[1] == ["f1", "f4", "f7"]
    # defaults from the live (single-process) runtime: identity
    assert shard_files_for_process(files) == files
    import pytest
    with pytest.raises(ValueError):
        shard_files_for_process(files, 3, 3)
