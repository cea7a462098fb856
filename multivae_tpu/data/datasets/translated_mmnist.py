"""Translated PolyMNIST: scaled/translated digits pasted on backgrounds.

Reference: ``src/multivae/data/datasets/translated_mmnist.py``. Dataset
generation (digit downscaling, random placement, background crop, color
inversion at the digit location) is ported to numpy/PIL; generated PNGs are
cached on disk with the same folder layout (``m{i}/{idx}.{digit}.png``).
"""

from __future__ import annotations

import glob
import logging
import os

import numpy as np

from .base import DatasetOutput, MultimodalBaseDataset
from .mnist_svhn import load_mnist

logger = logging.getLogger(__name__)


class TranslatedMMNIST(MultimodalBaseDataset):
    """Translated PolyMNIST built from background images.

    Args:
        path: parent folder for the generated dataset (MNIST raw files must
            be available under it, see ``load_mnist``).
        scale: digit downscale factor.
        translate: randomly place the downscaled digit.
        n_modalities: number of modalities (== background images used).
        background_path: folder of background .jpg images.
        split: 'train' or 'test'.
        seed: RNG seed for generation.
    """

    def __init__(self, path: str, scale: float, translate: bool,
                 n_modalities: int, background_path: str = None,
                 split: str = "train", transform=None,
                 target_transform=None, seed: int = 0):
        self.scale = scale
        self.translate = translate
        self.parent_path = path
        self.num_modalities = n_modalities
        self.save_path = os.path.join(
            path,
            f"Translated_MMNIST_scale_{int(scale * 100)}_translated_"
            f"{translate}", split,
        )
        self._rng = np.random.default_rng(seed)

        unimodal_paths = [os.path.join(self.save_path, f"m{i}")
                          for i in range(n_modalities)]
        self.check_or_create_dataset(unimodal_paths, background_path, split)

        self.file_paths = {}
        num_files = None
        for dp in unimodal_paths:
            files = sorted(glob.glob(os.path.join(dp, "*.png")))
            self.file_paths[dp] = files
            if num_files is None:
                num_files = len(files)
            assert len(files) == num_files, \
                "each modality must have the same number of images"
        self.num_files = num_files

    def check_or_create_dataset(self, unimodal_paths, background_path,
                                split):
        """Reference ``check_or_create_dataset`` (``:101-117``)."""
        data_exists = all(os.path.exists(p) for p in unimodal_paths)
        if not data_exists:
            if background_path is None:
                raise ValueError(
                    "The provided path does not contain the dataset in the "
                    "proper format and no background path was provided."
                )
            if not os.path.exists(background_path):
                raise ValueError(
                    f"Provided path {background_path} doesn't exist"
                )
            logger.info(
                "Dataset not found, creating dataset from the background "
                "path."
            )
            self._create_mmnist_dataset(background_path, split == "train")

    def _create_mmnist_dataset(self, background_path, train: bool):
        """Reference ``_create_mmnist_dataset`` (``:119-177``)."""
        from PIL import Image

        images, targets = load_mnist(self.parent_path, train=train)
        background_filepaths = sorted(
            glob.glob(os.path.join(background_path, "*.jpg"))
            + glob.glob(os.path.join(background_path, "*.png"))
        )
        if self.num_modalities > len(background_filepaths):
            raise ValueError(
                "Number of background images must be larger or equal to "
                "number of modalities"
            )
        backgrounds = [Image.open(fp).convert("RGB")
                       for fp in background_filepaths]

        for m in range(self.num_modalities):
            os.makedirs(os.path.join(self.save_path, f"m{m}"), exist_ok=True)

        cnt = 0
        for digit in range(10):
            ixs = np.nonzero(targets == digit)[0]
            for m in range(self.num_modalities):
                ixs_perm = ixs[self._rng.permutation(len(ixs))]
                for i, ix in enumerate(ixs_perm):
                    new_img = self._add_background_image(
                        backgrounds[m], images[ix]
                    )
                    out = (np.clip(new_img, 0, 1) * 255).astype(np.uint8)
                    Image.fromarray(np.transpose(out, (1, 2, 0))).save(
                        os.path.join(self.save_path,
                                     f"m{m}/{i}.{digit}.png")
                    )
                    cnt += 1
        logger.info("Saved %d images to %s", cnt, self.save_path)

    def _add_background_image(self, background_pil, mnist_image,
                              change_colors: bool = False):
        """Reference ``_add_background_image`` (``:179-223``)."""
        import jax

        mnist_image = np.asarray(mnist_image, np.float32)
        if self.translate:
            small = int(28 * self.scale)
            down = np.asarray(jax.image.resize(
                mnist_image, (small, small), method="bilinear"
            ))
            canvas = np.zeros_like(mnist_image)
            x = self._rng.integers(0, int(28 * (1 - self.scale)))
            y = self._rng.integers(0, int(28 * (1 - self.scale)))
            canvas[x:x + small, y:y + small] = down
            mnist_image = canvas

        binarized = mnist_image > 128

        x_c = self._rng.integers(0, background_pil.size[0] - 28)
        y_c = self._rng.integers(0, background_pil.size[1] - 28)
        crop = background_pil.crop((x_c, y_c, x_c + 28, y_c + 28))
        new_img = np.transpose(
            np.asarray(crop, np.float32) / 255.0, (2, 0, 1)
        )
        if change_colors:
            for j in range(3):
                new_img[:, :, j] = (
                    new_img[:, :, j] + self._rng.uniform(0, 1)
                ) / 2.0
        new_img[:, binarized] = 1.0 - new_img[:, binarized]
        return new_img

    def _load_png(self, path):
        from PIL import Image

        with Image.open(path) as img:
            arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
        return np.transpose(arr, (2, 0, 1))

    def __len__(self):
        return self.num_files

    def __getitem__(self, index):
        files = [self.file_paths[dp][index] for dp in self.file_paths]
        images = {f"m{m}": self._load_png(files[m])
                  for m in range(self.num_modalities)}
        label = int(os.path.basename(files[0]).split(".")[-2])
        return DatasetOutput(data=images, labels=label)

    def get_batch(self, indices):
        images = {f"m{m}": [] for m in range(self.num_modalities)}
        labels = []
        for idx in indices:
            files = [self.file_paths[dp][idx] for dp in self.file_paths]
            for m in range(self.num_modalities):
                images[f"m{m}"].append(self._load_png(files[m]))
            labels.append(int(os.path.basename(files[0]).split(".")[-2]))
        return DatasetOutput(
            data={k: np.stack(v) for k, v in images.items()},
            labels=np.asarray(labels),
        )
