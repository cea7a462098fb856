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

Golden-output verification (offline pass/fail for a finished conversion)::

    # pin: converted model's outputs on a fixed-seed probe input
    python scripts/convert_fid_weights.py verify-inception fid_model/model.msgpack
    python scripts/convert_fid_weights.py verify-classifiers .data/clf

    # after converting the REAL pt_inception checkpoint once, record its
    # golden so later conversions/machines get a strict pass/fail:
    python scripts/convert_fid_weights.py verify-inception model.msgpack --record

    # self-test of the whole pipeline against the checked-in golden
    # (seeded torch replica -> converter -> probe), no downloads needed:
    python scripts/convert_fid_weights.py selftest

``scripts/goldens/`` holds the checked-in pipeline goldens (generated from
the deterministic seeded torch replicas of tests/test_weight_converters.py
— the real ``pt_inception-2015-12-05`` weights cannot ship here, so the
real-weights golden is recorded by the first user who converts them).
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


GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")
PROBE_SEED = 20151205  # the pt_inception checkpoint's date, for memorability


def _probe_images(shape) -> "np.ndarray":
    import numpy as np

    rng = np.random.default_rng(PROBE_SEED)
    return rng.random(shape, dtype=np.float32)


def _summarize(name: str, arr) -> dict:
    import hashlib

    import numpy as np

    arr = np.asarray(arr, np.float32)
    # round to 1e-4 before hashing: conversions are f32-exact, but jax
    # versions may reorder reductions at ~1e-6
    digest = hashlib.sha256(np.round(arr, 4).tobytes()).hexdigest()[:16]
    print(f"{name}: shape={arr.shape} mean={arr.mean():.6f} "
          f"std={arr.std():.6f} sha256/1e-4={digest}")
    return {"values": arr}


def _check_or_record(outputs: dict, golden_path: str, record: bool,
                     atol: float = 3e-3) -> bool:
    import numpy as np

    if record:
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        np.savez(golden_path, **{k: v["values"] for k, v in outputs.items()})
        print(f"recorded golden -> {golden_path}")
        return True
    if not os.path.exists(golden_path):
        print(f"no golden at {golden_path} — printed the checksums above; "
              "run with --record to pin them.")
        return True
    golden = np.load(golden_path)
    ok = True
    for k, v in outputs.items():
        if k not in golden:
            print(f"FAIL: golden missing key {k}")
            ok = False
            continue
        if not np.allclose(golden[k], v["values"], atol=atol):
            diff = float(np.abs(golden[k] - v["values"]).max())
            print(f"FAIL: {k} deviates from golden (max abs diff {diff})")
            ok = False
    print("VERIFY PASS" if ok else "VERIFY FAIL")
    return ok


def verify_inception(msgpack_path: str, golden: str, record: bool) -> bool:
    """Probe a converted Inception msgpack on the fixed-seed input and
    compare its (pool, embedding) against the golden (reference weight
    pipeline: ``inception_networks.py:14-15,329-357``)."""
    import jax.numpy as jnp

    from multivae_tpu.metrics.fids.inception_networks import wrapper_inception

    fn = wrapper_inception(dims=2048, path_weights=msgpack_path)
    x = _probe_images((4, 3, 299, 299))
    out = fn(jnp.asarray(x))
    if isinstance(out, dict):
        out = out["embedding"]
    outputs = {"embedding": _summarize("embedding", out)}
    return _check_or_record(outputs, golden, record)


def verify_classifiers(dest_dir: str, golden: str, record: bool) -> bool:
    import jax.numpy as jnp

    from multivae_tpu.metrics.classifiers.mmnist import (
        load_mmnist_classifiers)

    clfs = load_mmnist_classifiers(dest_dir)
    x = _probe_images((4, 3, 28, 28))
    outputs = {}
    for m, clf in sorted(clfs.items()):
        logits = clf(jnp.asarray(x))
        outputs[f"logits_{m}"] = _summarize(f"logits_{m}", logits)
    return _check_or_record(outputs, golden, record)


def selftest(record: bool = False) -> bool:
    """Offline end-to-end pipeline pin: seeded torch replicas ->
    converter -> probe outputs vs the checked-in goldens. Requires no
    downloaded weights."""
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    import numpy as np
    import torch
    from flax import serialization

    from test_weight_converters import (
        _build_torch_fid_inception,
        _build_torch_polymnist_classifier,
    )

    from multivae_tpu.metrics.fids.inception_networks import (
        convert_torch_state_dict)
    from multivae_tpu.metrics.classifiers.mmnist import (
        convert_torch_classifier_state_dict)

    ok = True
    with tempfile.TemporaryDirectory() as td:
        torch_model = _build_torch_fid_inception(seed=0)
        sd = {k: np.asarray(v) for k, v in torch_model.state_dict().items()}
        variables = convert_torch_state_dict(sd)
        dest = os.path.join(td, "model.msgpack")
        with open(dest, "wb") as f:
            f.write(serialization.msgpack_serialize(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}))
        ok &= verify_inception(
            dest, os.path.join(GOLDEN_DIR, "fid_inception_pipeline.npz"),
            record)

        for i in range(5):
            clf = _build_torch_polymnist_classifier(seed=i)
            torch.save(clf.state_dict(),
                       os.path.join(td, f"pretrained_img_to_digit_clf_m{i}"))
            params = convert_torch_classifier_state_dict(
                {k: v.numpy() for k, v in clf.state_dict().items()})
            with open(os.path.join(
                    td, f"pretrained_img_to_digit_clf_m{i}.msgpack"),
                    "wb") as f:
                f.write(serialization.msgpack_serialize(params))
        ok &= verify_classifiers(
            td, os.path.join(GOLDEN_DIR, "classifiers_pipeline.npz"),
            record)
    return ok


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
    pv1 = sub.add_parser("verify-inception",
                         help="probe a converted Inception msgpack against "
                              "the recorded golden")
    pv1.add_argument("msgpack", help="converted model.msgpack")
    pv1.add_argument("--golden",
                     default=os.path.join(GOLDEN_DIR,
                                          "fid_inception_real.npz"))
    pv1.add_argument("--record", action="store_true",
                     help="write the golden instead of checking")
    pv2 = sub.add_parser("verify-classifiers",
                         help="probe converted PolyMNIST classifiers "
                              "against the recorded golden")
    pv2.add_argument("dest_dir", help="dir with the .msgpack classifiers")
    pv2.add_argument("--golden",
                     default=os.path.join(GOLDEN_DIR,
                                          "classifiers_real.npz"))
    pv2.add_argument("--record", action="store_true")
    pst = sub.add_parser("selftest",
                         help="offline pipeline pin vs checked-in goldens")
    pst.add_argument("--record", action="store_true")
    args = parser.parse_args(argv)

    if args.cmd == "inception":
        convert_inception(args.src, args.dest)
    elif args.cmd == "classifiers":
        convert_classifiers(args.src_dir, args.dest_dir)
    elif args.cmd == "verify-inception":
        if not verify_inception(args.msgpack, args.golden, args.record):
            sys.exit(1)
    elif args.cmd == "verify-classifiers":
        if not verify_classifiers(args.dest_dir, args.golden, args.record):
            sys.exit(1)
    elif args.cmd == "selftest":
        if not selftest(args.record):
            sys.exit(1)


if __name__ == "__main__":
    main()
