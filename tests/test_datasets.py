"""Dataset classes tested against tiny synthetic on-disk fixtures."""

import gzip
import json
import os
import struct

import numpy as np
import pytest

N_MNIST = 40
N_SVHN = 50


def write_idx_images(path, images):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 3))
        f.write(struct.pack(">III", *images.shape))
        f.write(images.astype(np.uint8).tobytes())


def write_idx_labels(path, labels):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 1))
        f.write(struct.pack(">I", len(labels)))
        f.write(labels.astype(np.uint8).tobytes())


@pytest.fixture
def mnist_dir(tmp_path):
    rng = np.random.default_rng(0)
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    for prefix, n in [("train", N_MNIST), ("t10k", 16)]:
        images = rng.integers(0, 255, size=(n, 28, 28), dtype=np.uint8)
        labels = (np.arange(n) % 10).astype(np.uint8)
        write_idx_images(str(raw / f"{prefix}-images-idx3-ubyte"), images)
        write_idx_labels(str(raw / f"{prefix}-labels-idx1-ubyte"), labels)
    return str(tmp_path)


def test_load_mnist_raw(mnist_dir):
    from multivae_tpu.data.datasets.mnist_svhn import load_mnist

    images, labels = load_mnist(mnist_dir, train=True)
    assert images.shape == (N_MNIST, 28, 28)
    assert labels.shape == (N_MNIST,)


def test_mnist_svhn_pairing(mnist_dir):
    from scipy import io as sio

    rng = np.random.default_rng(1)
    X = rng.integers(0, 255, size=(32, 32, 3, N_SVHN), dtype=np.uint8)
    y = (np.arange(N_SVHN) % 10 + 1).reshape(-1, 1)
    sio.savemat(os.path.join(mnist_dir, "train_32x32.mat"),
                {"X": X, "y": y})

    from multivae_tpu.data.datasets import MnistSvhn

    ds = MnistSvhn(data_path=mnist_dir, split="train",
                   data_multiplication=2)
    assert len(ds) > 0
    item = ds[0]
    assert item["data"]["mnist"].shape == (1, 28, 28)
    assert item["data"]["svhn"].shape == (3, 32, 32)
    # pairing must match labels across modalities: verify via batch labels
    batch = ds.get_batch(np.arange(4))
    assert batch["labels"].shape == (4,)
    # pairing indices are cached
    assert os.path.exists(os.path.join(
        mnist_dir, "mnist_svhn_idx_data_mul_2", "train", "mnist_idx.npy"))
    # reload uses the cache
    ds2 = MnistSvhn(data_path=mnist_dir, split="train",
                    data_multiplication=2)
    assert len(ds2) == len(ds)


@pytest.fixture
def mmnist_dir(tmp_path):
    import torch

    rng = np.random.default_rng(2)
    d = tmp_path / "MMNIST" / "train"
    d.mkdir(parents=True)
    n = 20
    for i in range(5):
        torch.save(torch.tensor(
            rng.uniform(size=(n, 3, 28, 28)).astype(np.float32)),
            str(d / f"m{i}.pt"))
    torch.save(torch.tensor((np.arange(n) % 10).astype(np.int64)),
               str(d / "labels.pt"))
    return str(tmp_path)


def test_mmnist_complete(mmnist_dir):
    from multivae_tpu.data.datasets import MMNISTDataset

    ds = MMNISTDataset(data_path=mmnist_dir, split="train")
    assert len(ds) == 20
    item = ds[0]
    assert set(item["data"].keys()) == {f"m{i}" for i in range(5)}
    assert "masks" not in item


def test_mmnist_incomplete(mmnist_dir):
    from multivae_tpu.data.datasets import MMNISTDataset

    ds = MMNISTDataset(data_path=mmnist_dir, split="train",
                       missing_ratio=0.4, keep_incomplete=True)
    assert len(ds) == 20
    item = ds[1]
    assert "masks" in item
    assert bool(np.asarray(item["masks"]["m0"]))  # m0 always available
    # masked samples are zero-erased
    for m in ["m1", "m2", "m3", "m4"]:
        missing = ~ds.masks[m]
        if missing.any():
            assert np.allclose(ds.data[m][missing], 0.0)
    # keep_incomplete=False shortens the dataset
    ds2 = MMNISTDataset(data_path=mmnist_dir, split="train",
                        missing_ratio=0.4, keep_incomplete=False)
    assert len(ds2) < 20


def test_mhd(tmp_path):
    import torch

    rng = np.random.default_rng(3)
    n = 16
    s = torch.tensor((np.arange(n) % 10).astype(np.int64))
    i_data = torch.tensor(rng.uniform(size=(n, 1, 28, 28)).astype(np.float32))
    t_data = torch.tensor(rng.normal(size=(n, 200)).astype(np.float32))
    a_data = torch.tensor(rng.normal(size=(n, 3, 32, 32)).astype(np.float32))
    torch.save((s, i_data, t_data, a_data, (0, 1), (0, 1)),
               str(tmp_path / "mhd_train.pt"))

    from multivae_tpu.data.datasets import MHD

    ds = MHD(str(tmp_path), split="train")
    item = ds[0]
    assert item["data"]["audio"].shape == (1, 32, 96)
    assert item["data"]["label"].shape == (10,)
    assert "masks" not in item

    # MNAR missingness: class 0 of image always missing
    probs = {m: [0.0] * 10 for m in
             ["label", "audio", "trajectory", "image"]}
    probs["image"] = [1.0] + [0.0] * 9
    ds2 = MHD(str(tmp_path), split="train", missing_probabilities=probs)
    assert ds2.is_incomplete
    class0 = np.asarray(ds2.labels) == 0
    assert not ds2.masks["image"][class0].any()
    assert ds2.masks["image"][~class0].all()


def test_mnist_labels(mnist_dir):
    from multivae_tpu.data.datasets import MnistLabels

    ds = MnistLabels(data_path=mnist_dir, split="train")
    item = ds[3]
    assert item["data"]["images"].shape == (1, 28, 28)
    assert item["data"]["labels"].shape == (1, 10)
    assert item["data"]["labels"][0, 3] == 1.0


def test_celeba(tmp_path):
    from PIL import Image

    base = tmp_path / "celeba"
    imgdir = base / "img_align_celeba"
    imgdir.mkdir(parents=True)
    rng = np.random.default_rng(4)
    names = [f"{i:06d}.jpg" for i in range(1, 7)]
    for n in names:
        Image.fromarray(
            rng.integers(0, 255, (109, 89, 3), dtype=np.uint8)
        ).save(str(imgdir / n))
    attrs = rng.choice([-1, 1], size=(6, 40))
    with open(base / "list_attr_celeba.txt", "w") as f:
        f.write("6\n" + " ".join([f"attr{i}" for i in range(40)]) + "\n")
        for n, row in zip(names, attrs):
            f.write(n + " " + " ".join(str(v) for v in row) + "\n")
    with open(base / "list_eval_partition.txt", "w") as f:
        for i, n in enumerate(names):
            f.write(f"{n} {0 if i < 4 else 2}\n")

    from multivae_tpu.data.datasets import CelebAttr

    ds = CelebAttr(root=str(tmp_path), split="train")
    assert len(ds) == 4
    item = ds[0]
    assert item["data"]["image"].shape == (3, 64, 64)
    assert item["data"]["attributes"].shape == (18,)
    batch = ds.get_batch(np.arange(2))
    assert batch["data"]["image"].shape == (2, 3, 64, 64)

    ds40 = CelebAttr(root=str(tmp_path), split="test", attributes="40")
    assert ds40[0]["data"]["attributes"].shape == (40,)


def test_translated_mmnist(mnist_dir, tmp_path):
    from PIL import Image

    bg = tmp_path / "backgrounds"
    bg.mkdir()
    rng = np.random.default_rng(5)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(str(bg / f"bg{i}.jpg"))

    from multivae_tpu.data.datasets import TranslatedMMNIST

    ds = TranslatedMMNIST(
        path=mnist_dir, scale=0.75, translate=True, n_modalities=2,
        background_path=str(bg), split="train",
    )
    assert len(ds) == N_MNIST
    item = ds[0]
    assert item["data"]["m0"].shape == (3, 28, 28)
    batch = ds.get_batch(np.arange(3))
    assert batch["data"]["m1"].shape == (3, 3, 28, 28)


def test_cub(tmp_path):
    from PIL import Image

    cub = tmp_path / "cub"
    for split in ["train", "test"]:
        d = cub / split / "class_0"
        d.mkdir(parents=True)
    rng = np.random.default_rng(6)
    # 2 train images x 10 captions, 1 test image x 10 captions
    for split, n_img in [("train", 2), ("test", 1)]:
        for i in range(n_img):
            Image.fromarray(
                rng.integers(0, 255, (80, 70, 3), dtype=np.uint8)
            ).save(str(cub / split / "class_0" / f"img{i}.jpg"))
    sents = ["this bird is red and small.", "a small bird with red wings.",
             "the bird has a long red beak.", "red bird."]
    with open(cub / "text_trainvalclasses.txt", "w") as f:
        for i in range(20):
            f.write(sents[i % 4] + "\n")
    with open(cub / "text_testclasses.txt", "w") as f:
        for i in range(10):
            f.write(sents[i % 4] + "\n")

    from multivae_tpu.data.datasets import CUB

    ds = CUB(path=str(tmp_path), split="test", max_words_in_caption=8,
             im_size=(32, 32), output_type="one_hot")
    item = ds[0]
    assert item["data"]["image"].shape == (3, 32, 32)
    assert item["data"]["text"]["one_hot"].shape[0] == 8
    assert item["data"]["text"]["padding_mask"].shape == (8,)

    ds_tok = CUB(path=str(tmp_path), split="test", max_words_in_caption=8,
                 output_type="tokens")
    assert ds_tok[0]["data"]["text"]["tokens"].shape == (8,)
    batch = ds_tok.get_batch(np.arange(3))
    assert batch["data"]["text"]["tokens"].shape == (3, 8)
    assert ds_tok.vocab_size > 4


def test_resample_dataset():
    from multivae_tpu.data import MultimodalBaseDataset, ResampleDataset

    rng = np.random.default_rng(7)
    ds = MultimodalBaseDataset(
        {"a": rng.normal(size=(10, 2)).astype(np.float32)},
        labels=np.arange(10),
    )
    sub = ResampleDataset(ds, indices=[2, 4, 6])
    assert len(sub) == 3
    np.testing.assert_allclose(sub[0]["data"]["a"], ds.data["a"][2])
    batch = sub.get_batch(np.array([0, 2]))
    np.testing.assert_allclose(batch["data"]["a"], ds.data["a"][[2, 6]])


def test_random_split():
    from multivae_tpu.data import (
        IncompleteDataset,
        MultimodalBaseDataset,
        random_split,
    )

    rng = np.random.default_rng(0)
    ds = MultimodalBaseDataset(
        {"a": rng.normal(size=(20, 3)).astype(np.float32)},
        labels=np.arange(20),
    )
    tr, ev = random_split(ds, [0.9, 0.1], seed=1)
    assert len(tr) == 18 and len(ev) == 2
    # disjoint cover of the dataset
    assert sorted(np.concatenate([tr.indices, ev.indices])) == list(range(20))
    # deterministic under the same seed
    tr2, _ = random_split(ds, [0.9, 0.1], seed=1)
    np.testing.assert_array_equal(tr.indices, tr2.indices)

    with pytest.raises(ValueError):
        random_split(ds, [0.5, 0.4])

    # masks flow through the split views
    inc = IncompleteDataset(
        data={"a": rng.normal(size=(10, 3)).astype(np.float32)},
        masks={"a": np.arange(10) % 2 == 0},
    )
    tr, ev = random_split(inc, [0.8, 0.2], seed=0)
    b = tr.get_batch(np.arange(len(tr)))
    assert "masks" in b and b["masks"]["a"].shape == (8,)


def test_download_extract_local_zip(tmp_path, monkeypatch):
    """The download helper extracts a (locally served) archive; the MMNIST
    download=True path routes through it."""
    import io
    import zipfile

    from multivae_tpu.data import download as dl

    # build a fake PolyMNIST zip
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for split in ("train", "test"):
            for i in range(5):
                arr = np.random.rand(4, 3, 28, 28).astype(np.float32)
                with io.BytesIO() as f:
                    np.save(f, arr)
                    zf.writestr(f"MMNIST/{split}/m{i}.npy", f.getvalue())
            lab = (np.arange(4) % 10).astype(np.int64)
            with io.BytesIO() as f:
                np.save(f, lab)
                zf.writestr(f"MMNIST/{split}/labels.npy", f.getvalue())
    zip_bytes = buf.getvalue()

    def fake_urlretrieve(url, dest):
        with open(dest, "wb") as f:
            f.write(zip_bytes)

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)

    from multivae_tpu.data.datasets import MMNISTDataset

    ds = MMNISTDataset(data_path=str(tmp_path), split="train", download=True)
    assert len(ds) == 4
    assert ds[0]["data"]["m0"].shape == (3, 28, 28)

    # download failure surfaces the manual URL
    def broken(url, dest):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlretrieve", broken)
    with pytest.raises(RuntimeError, match="Download manually"):
        dl.fetch_and_extract("http://example.com/x.zip", str(tmp_path / "y"))


def test_fetch_and_extract_checksum(tmp_path):
    """sha256 verification: a matching digest extracts, a mismatch deletes
    the archive and raises with both digests."""
    import zipfile

    from multivae_tpu.data.download import fetch_and_extract, sha256_of

    src = tmp_path / "payload.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("inner.txt", "hello")
    url = src.as_uri()

    good = sha256_of(str(src))
    out = tmp_path / "ok"
    fetch_and_extract(url, str(out), sha256=good.upper())  # case-insensitive
    assert (out / "inner.txt").read_text() == "hello"

    bad_dir = tmp_path / "bad"
    with pytest.raises(RuntimeError, match="Checksum mismatch"):
        fetch_and_extract(url, str(bad_dir), sha256="0" * 64)
    assert not (bad_dir / "payload.zip").exists()  # corrupt file removed
