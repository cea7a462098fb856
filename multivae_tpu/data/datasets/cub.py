"""CUB birds image + caption dataset with vocab building.

Reference: ``src/multivae/data/datasets/cub.py`` (CUBSentences vocab
building + tokenization ``:40-276``, paired CUB ``:278-462``). Expects the
Oxford mmdgm ``cub`` folder layout: ``text_trainvalclasses.txt`` /
``text_testclasses.txt`` under ``cub``, and image class folders under
``cub/train`` / ``cub/test``. Each image is paired with 10 captions.
Tokenization uses nltk when importable, else a simple regex tokenizer.
"""

from __future__ import annotations

import json
import logging
import os
from collections import Counter, OrderedDict

import numpy as np

from .base import DatasetOutput, MultimodalBaseDataset

logger = logging.getLogger(__name__)


def _tokenize(sentence: str):
    try:
        from nltk.tokenize import word_tokenize

        return word_tokenize(sentence.lower())
    except Exception:
        import re

        return re.findall(r"[\w']+|[.,!?;]", sentence.lower())


class CUBSentences:
    """Tokenized CUB captions with vocab building + JSON caching.

    Reference ``CUBSentences`` (``cub.py:40-276``): special tokens
    {<pad>=0, <eos>=1, <unk>=2, <exc>=3}; captions truncated/padded to
    ``max_sequence_length``; output either one-hot or token dicts.
    """

    special_tokens = ["<pad>", "<eos>", "<unk>", "<exc>"]

    def __init__(self, root_data_dir: str, split: str,
                 output_type: str = "one_hot", transform=None,
                 max_sequence_length: int = 32, min_occ: int = 3):
        self.split = split
        self.data_dir = os.path.join(root_data_dir, "cub")
        self.max_sequence_length = max_sequence_length
        self.min_occ = min_occ
        self.output_type = output_type
        self.transform = transform

        self.gen_dir = os.path.join(
            self.data_dir, f"oc_{min_occ}_msl_{max_sequence_length}"
        )
        os.makedirs(self.gen_dir, exist_ok=True)
        self.raw_data_path = os.path.join(
            self.data_dir,
            "text_trainvalclasses.txt" if split == "train"
            else "text_testclasses.txt",
        )
        self.data_file = f"cub.{split}.s{max_sequence_length}.json"
        self.vocab_file = "cub.vocab.json"
        self._load_data()

    # ----------------------------------------------------------- vocabulary
    def _load_vocab(self):
        path = os.path.join(self.gen_dir, self.vocab_file)
        if not os.path.exists(path):
            self._create_vocab()
        with open(path) as f:
            vocab = json.load(f)
        self.w2i, self.i2w = vocab["w2i"], vocab["i2w"]

    def _create_vocab(self):
        """Build the vocabulary from the TRAIN captions
        (reference ``:204-261``)."""
        train_path = os.path.join(self.data_dir,
                                  "text_trainvalclasses.txt")
        with open(train_path) as f:
            text = f.read()
        sentences = _split_sentences(text)

        occ = Counter()
        w2i = OrderedDict()
        i2w = OrderedDict()
        for st in self.special_tokens:
            i2w[str(len(w2i))] = st
            w2i[st] = len(w2i)
        for sentence in sentences:
            occ.update(_tokenize(sentence))
        for word, count in occ.items():
            if count >= self.min_occ and word not in self.special_tokens:
                i2w[str(len(w2i))] = word
                w2i[word] = len(w2i)
        with open(os.path.join(self.gen_dir, self.vocab_file), "w") as f:
            json.dump({"w2i": w2i, "i2w": i2w}, f)

    # ----------------------------------------------------------------- data
    def _load_data(self):
        self._load_vocab()
        path = os.path.join(self.gen_dir, self.data_file)
        if not os.path.exists(path):
            self._create_data()
        with open(path) as f:
            self.data = json.load(f)

    def _create_data(self):
        """Tokenize + index + pad the captions (reference ``:160-202``)."""
        with open(self.raw_data_path) as f:
            text = f.read()
        sentences = _split_sentences(text)
        data = {}
        for i, line in enumerate(sentences):
            words = _tokenize(line)
            tok = words[: self.max_sequence_length - 1]
            tok = tok + ["<eos>"]
            length = len(tok)
            tok.extend(["<pad>"] * (self.max_sequence_length - length))
            idx = [self.w2i.get(w, self.w2i["<exc>"]) for w in tok]
            data[str(i)] = {"idx": idx, "length": length}
        with open(os.path.join(self.gen_dir, self.data_file), "w") as f:
            json.dump(data, f)

    # ------------------------------------------------------------------ api
    @property
    def vocab_size(self):
        return len(self.w2i)

    @property
    def pad_idx(self):
        return self.w2i["<pad>"]

    @property
    def eos_idx(self):
        return self.w2i["<eos>"]

    @property
    def unk_idx(self):
        return self.w2i["<unk>"]

    def get_w2i(self):
        return self.w2i

    def get_i2w(self):
        return self.i2w

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        entry = self.data[str(int(idx))]
        tokens = np.asarray(entry["idx"], np.int64)
        length = entry["length"]
        padding_mask = (np.arange(self.max_sequence_length)
                        < length).astype(np.float32)
        if self.output_type == "tokens":
            return {"tokens": tokens, "padding_mask": padding_mask}
        one_hot = np.eye(self.vocab_size, dtype=np.float32)[tokens]
        return {"one_hot": one_hot, "padding_mask": padding_mask}

    def one_hot_to_string(self, data):
        """Reference ``:263-276``."""
        ids = np.argmax(np.asarray(data), axis=-1)
        return [" ".join(self.i2w[str(int(i))] for i in row) for row in
                np.atleast_2d(ids)]


def _split_sentences(text: str):
    try:
        from nltk.tokenize import sent_tokenize

        return sent_tokenize(text)
    except Exception:
        return [s.strip() + "." for s in text.split(".") if s.strip()]


class CUB(MultimodalBaseDataset):
    """Paired image-caption CUB dataset (10 captions per image).

    Reference ``CUB`` (``cub.py:278-462``).
    """

    def __init__(self, path: str, split: str = "train",
                 max_words_in_caption: int = 32, im_size=(64, 64),
                 img_transform=None, output_type: str = "one_hot",
                 download: bool = False):
        if not os.path.exists(os.path.join(path, "cub")):
            if download:
                from ..download import maybe_download_cub

                maybe_download_cub(path)
            if not os.path.exists(os.path.join(path, "cub")):
                raise AttributeError(
                    "The CUB dataset is not available at the given "
                    "datapath. Pass download=True or place the oxford mmdgm "
                    "cub folder there."
                )
        self.split = split
        self.path = path
        self.im_size = tuple(im_size)
        self.img_transform = img_transform
        self.output_type = output_type

        text_split = "train" if split == "eval" else split
        img_split = "train" if split == "eval" else split
        self.text_data = CUBSentences(
            path, text_split, output_type=output_type,
            max_sequence_length=max_words_in_caption,
        )
        img_dir = os.path.join(path, "cub", img_split)
        self.image_files = []
        for cls in sorted(os.listdir(img_dir)):
            cls_dir = os.path.join(img_dir, cls)
            if os.path.isdir(cls_dir):
                self.image_files.extend(
                    os.path.join(cls_dir, f) for f in sorted(
                        os.listdir(cls_dir))
                    if f.lower().endswith((".jpg", ".jpeg", ".png"))
                )
        if split in ("train", "eval"):
            rng = np.random.default_rng(0)
            idx = rng.permutation(len(self.text_data))
            n_val = max(1, int(0.1 * len(idx)))
            self.val_idx = idx[:n_val]
            self.train_idx = idx[n_val:]
        self.vocab_size = self.text_data.vocab_size

    def _load_image(self, file):
        from PIL import Image

        with Image.open(file) as img:
            img = img.convert("RGB").resize(self.im_size[::-1])
        arr = np.transpose(np.asarray(img, np.float32) / 255.0, (2, 0, 1))
        if self.img_transform is not None:
            arr = self.img_transform(arr)
        return arr

    def __len__(self):
        if self.split == "train":
            return len(self.train_idx)
        if self.split == "eval":
            return len(self.val_idx)
        return len(self.text_data)

    def __getitem__(self, index):
        if self.split == "train":
            index = int(self.train_idx[index])
        elif self.split == "eval":
            index = int(self.val_idx[index])
        image = self._load_image(self.image_files[index // 10])
        text = self.text_data[index]
        return DatasetOutput(data=dict(image=image, text=text))

    def get_batch(self, indices):
        outs = [self[int(i)] for i in indices]
        images = np.stack([o["data"]["image"] for o in outs])
        text_keys = outs[0]["data"]["text"].keys()
        text = {k: np.stack([o["data"]["text"][k] for o in outs])
                for k in text_keys}
        return DatasetOutput(data=dict(image=images, text=text))

    def transform_for_plotting(self, tensor, modality):
        return tensor
