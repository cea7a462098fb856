"""Convert reference torch checkpoints to multivae_tpu msgpack weights.

Two pipelines (no network egress here — you supply the checkpoint files):

1. FID InceptionV3 (pytorch-fid / mseitzer variant). The reference downloads
   ``pt_inception-2015-12-05-6726825d.pth`` and loads it in
   ``src/multivae/metrics/fids/inception_networks.py:167-198``; this script
   converts that file to the msgpack the ``FIDEvaluatorConfig
   .inception_weights_path`` expects::

       python scripts/convert_fid_weights.py inception \
           pt_inception-2015-12-05-6726825d.pth fid_model/model.msgpack

2. PolyMNIST digit classifiers (5 files, shipped inside the reference's
   PolyMNIST.zip — ``src/multivae/metrics/classifiers/mmnist.py:47-65``)::

       python scripts/convert_fid_weights.py classifiers .data/clf .data/clf

   writes ``pretrained_img_to_digit_clf_m{0..4}.msgpack`` next to the torch
   checkpoints (``load_mmnist_classifiers`` also accepts the raw torch files
   directly when torch is installed; the msgpack path needs no torch).

Conversion is verified numerically in ``tests/test_weight_converters.py``
(embedding/logit agreement torch vs flax on randomized weights).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert_inception(src: str, dest: str) -> None:
    import numpy as np
    import torch
    from flax import serialization

    from multivae_tpu.metrics.fids.inception_networks import (
        InceptionV3FID, convert_torch_state_dict)

    state_dict = torch.load(src, map_location="cpu", weights_only=True)
    state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
    variables = convert_torch_state_dict(state_dict)

    # Sanity: the converted tree must initialize-apply cleanly.
    import jax.numpy as jnp

    out = InceptionV3FID().apply(variables, jnp.zeros((1, 3, 299, 299)))
    assert out["embedding"].shape == (1, 2048)

    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    with open(dest, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}))
    print(f"wrote {dest}")


def convert_classifiers(src_dir: str, dest_dir: str) -> None:
    import torch
    from flax import serialization

    from multivae_tpu.metrics.classifiers.mmnist import (
        convert_torch_classifier_state_dict)

    os.makedirs(dest_dir, exist_ok=True)
    for i in range(5):
        src = os.path.join(src_dir, f"pretrained_img_to_digit_clf_m{i}")
        sd = torch.load(src, map_location="cpu", weights_only=True)
        params = convert_torch_classifier_state_dict(
            {k: v.numpy() for k, v in sd.items()})
        dest = os.path.join(
            dest_dir, f"pretrained_img_to_digit_clf_m{i}.msgpack")
        with open(dest, "wb") as f:
            f.write(serialization.msgpack_serialize(params))
        print(f"wrote {dest}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("inception", help="convert pt_inception .pth")
    p1.add_argument("src", help="pt_inception-2015-12-05-6726825d.pth")
    p1.add_argument("dest", help="output msgpack path "
                                 "(FIDEvaluatorConfig.inception_weights_path)")
    p2 = sub.add_parser("classifiers", help="convert PolyMNIST classifiers")
    p2.add_argument("src_dir", help="dir with pretrained_img_to_digit_clf_m*")
    p2.add_argument("dest_dir", help="output dir for the .msgpack files")
    args = parser.parse_args(argv)

    if args.cmd == "inception":
        convert_inception(args.src, args.dest)
    else:
        convert_classifiers(args.src_dir, args.dest_dir)


if __name__ == "__main__":
    main()
