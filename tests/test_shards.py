import io
import tarfile

import numpy as np

from octcubem_tpu.data.shards import ShardDataset, iterate_shard


def _make_shard(path, keys, seed=0):
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tar:
        for k in keys:
            arr = rng.random((4, 4)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, arr)
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{k}.npy")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
            lab = str(int(k[-1]) % 2).encode()
            info = tarfile.TarInfo(f"{k}.cls")
            info.size = len(lab)
            tar.addfile(info, io.BytesIO(lab))


def test_iterate_shard_groups_by_key(tmp_path):
    p = str(tmp_path / "s0.tar")
    _make_shard(p, [f"sample{i}" for i in range(5)])
    samples = list(iterate_shard(p))
    assert len(samples) == 5
    assert samples[0]["npy"].shape == (4, 4)
    assert samples[0]["cls"] in ("0", "1")
    assert samples[0]["__key__"] == "sample0"


def test_shard_dataset_deterministic_and_split(tmp_path):
    paths = []
    for s in range(4):
        p = str(tmp_path / f"s{s}.tar")
        _make_shard(p, [f"shard{s}_item{i}" for i in range(3)], seed=s)
        paths.append(p)
    ds = ShardDataset(paths, shuffle_buffer=4, seed=7)
    ds.set_epoch(0)
    keys_a = [s["__key__"] for s in ds]
    ds.set_epoch(0)
    keys_b = [s["__key__"] for s in ds]
    assert keys_a == keys_b and len(keys_a) == 12
    ds.set_epoch(1)
    assert [s["__key__"] for s in ds] != keys_a

    # worker split covers everything exactly once
    w0 = ShardDataset(paths, shuffle_buffer=1, seed=7, worker_index=0,
                      num_workers=2)
    w1 = ShardDataset(paths, shuffle_buffer=1, seed=7, worker_index=1,
                      num_workers=2)
    all_keys = {s["__key__"] for s in w0} | {s["__key__"] for s in w1}
    assert len(all_keys) == 12


def test_iterate_shard_dotted_directory(tmp_path):
    """The sample key must split the extension at the BASENAME's first
    dot, not the path's (regression: members under a dotted directory
    like 'v1.2/' collapsed every sample in the shard into one)."""
    p = str(tmp_path / "dotted.tar")
    _make_shard(p, [f"v1.2/sample{i}" for i in range(3)])
    samples = list(iterate_shard(p))
    assert len(samples) == 3
    assert samples[0]["__key__"] == "v1.2/sample0"
    assert samples[0]["npy"].shape == (4, 4)
    assert samples[0]["cls"] in ("0", "1")
