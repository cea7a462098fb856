"""Device mesh + sharding helpers: the TPU-native replacement for DDP.

The reference's only parallelism is data parallelism via torch DDP + NCCL +
DistributedSampler (``src/multivae/trainers/base/base_trainer.py:93-222``,
SURVEY §2.3). Here the equivalent is:

- a 1-D ``jax.sharding.Mesh`` over all devices (axis "data"),
- batches sharded over the leading axis with ``NamedSharding``,
- parameters/optimizer state replicated,
- gradient all-reduce inserted by XLA (rides ICI intra-pod, DCN across
  hosts) when the jitted train step consumes the sharded batch.

Multi-host: ``maybe_init_distributed`` wraps ``jax.distributed.initialize``
(replacing env-var NCCL rendezvous, reference ``base_trainer.py:186-192``).
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize JAX multi-host if a coordinator is configured.

    No-op in single-process mode. Mirrors the reference's conditional
    ``dist.init_process_group`` (``base_trainer.py:172-194``).
    """
    if coordinator_address is None or (num_processes or 1) <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "Initialized jax.distributed: process %d / %d",
        jax.process_index(), jax.process_count(),
    )


def get_data_mesh(n_devices: Optional[int] = None, devices=None,
                  n_model_devices: int = 1) -> Mesh:
    """A device mesh with axis "data" (batch parallel), optionally 2-D with
    a trailing "model" axis for tensor parallelism.

    ``n_devices`` counts the data axis; the total devices used is
    ``n_devices * n_model_devices``. Adjacent devices land on the model
    axis so tensor-parallel collectives ride the fastest links
    (scaling-book layout recipe).
    """
    if devices is None:
        devices = jax.devices()
    total = None if n_devices is None else n_devices * n_model_devices
    if total is not None:
        if total > len(devices):
            raise ValueError(
                f"Requested {total} devices but only {len(devices)} are "
                "visible."
            )
        devices = devices[:total]
    if n_model_devices > 1:
        if len(devices) % n_model_devices:
            raise ValueError(
                f"{len(devices)} devices do not factor over "
                f"n_model_devices={n_model_devices}."
            )
        grid = np.asarray(devices).reshape(-1, n_model_devices)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis (replicated over
    the model axis when present)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def tp_state_sharding(state, mesh: Mesh, min_dim: int = 64):
    """Tensor-parallel sharding spec for a train-state pytree.

    Megatron-style column sharding expressed declaratively: any float leaf
    with ndim >= 1 whose LAST axis divides the mesh's model axis (and is at
    least ``min_dim`` wide) is sharded on that axis — dense kernels
    (in, out) split their output features, their biases (out,) follow, and
    the mirrored Adam moments inherit the same specs by shape. Everything
    else is replicated over "model". XLA's SPMD propagation inserts the
    activation collectives; no model-code changes are needed (the
    scaling-book recipe: annotate params, let the compiler place
    all-gathers/reduce-scatters). Composes with the "data" axis: batch
    stays sharded on "data", parameters are replicated over "data" unless
    combined with ``fsdp_state_sharding``.
    """
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError("tp_state_sharding needs a mesh with a "
                         f"'{MODEL_AXIS}' axis; got {mesh.axis_names}.")
    return combined_state_sharding(state, mesh, fsdp=False, min_dim=min_dim)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_state_sharding(state, mesh: Mesh, min_size: int = 1024):
    """ZeRO-style sharding spec for a train-state pytree.

    Any float leaf whose leading axis divides the mesh is sharded on that
    axis (parameters AND their mirrored optimizer moments, which share
    shapes); everything else — scalars, small vectors, rng keys — is
    replicated. XLA inserts the all-gathers at use sites and
    reduce-scatters the matching gradients: the compiler does what
    DeepSpeed/FSDP do by hand (scaling-book recipe; the reference has
    only DDP, ``base_trainer.py:117-118``, so this is a TPU-native
    extension, not a parity item). On a 2-D (data, model) mesh only the
    data axis is used here; compose with ``tp_state_sharding`` for the
    model axis.
    """
    n = mesh.shape[DATA_AXIS]

    def spec(x):
        shape = getattr(x, "shape", ())
        if (len(shape) >= 1 and shape[0] % n == 0
                and int(np.prod(shape)) >= min_size
                and jnp.issubdtype(
                    getattr(x, "dtype", jnp.float32), jnp.floating)):
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, state)


def combined_state_sharding(state, mesh: Mesh, fsdp: bool = False,
                            min_size: int = 1024, min_dim: int = 64):
    """Compose ZeRO (leading axis over "data") and tensor-parallel
    (trailing axis over "model") sharding for one train-state pytree.

    Either half applies only where its axis exists in the mesh / the flag
    is set; a 1-D leaf takes at most one of the two. See
    ``fsdp_state_sharding`` / ``tp_state_sharding`` for the per-axis rules.
    """
    data_n = mesh.shape[DATA_AXIS]
    tp = MODEL_AXIS in mesh.axis_names
    model_n = mesh.shape[MODEL_AXIS] if tp else 1

    def spec(x):
        shape = getattr(x, "shape", ())
        if not (len(shape) >= 1 and jnp.issubdtype(
                getattr(x, "dtype", jnp.float32), jnp.floating)):
            return NamedSharding(mesh, P())
        dims = [None] * len(shape)
        col_ok = tp and shape[-1] % model_n == 0 and shape[-1] >= min_dim
        if len(shape) == 1:
            # bias-like 1-D leaf: the Megatron column rule wins over the
            # fsdp leading-axis rule, so a bias lands on the SAME axis as
            # its kernel's output columns — sharding it over "data"
            # instead would force a per-step resharding collective
            # between the matmul output and the bias add.
            if col_ok:
                dims[-1] = MODEL_AXIS
            elif (fsdp and shape[0] % data_n == 0
                    and int(np.prod(shape)) >= min_size):
                dims[0] = DATA_AXIS
        else:
            if (fsdp and shape[0] % data_n == 0
                    and int(np.prod(shape)) >= min_size):
                dims[0] = DATA_AXIS
            if col_ok and dims[-1] is None:
                dims[-1] = MODEL_AXIS
        if all(d is None for d in dims):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*dims))

    return jax.tree.map(spec, state)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the batch axis sharded.

    On a SINGLE-device mesh the sharded put is a semantic no-op but
    produces COMMITTED arrays, which fall off the axon TPU plugin's fast
    execution path (see ``utils/host_init.py``) — plain uncommitted
    device_put there."""
    if mesh.size == 1 and jax.process_count() == 1:
        return jax.tree.map(
            lambda x: None if x is None else jax.device_put(x), batch,
            is_leaf=lambda x: x is None)
    sharding = batch_sharding(mesh)
    multi_host = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        if multi_host:
            # each process holds its slice of the global batch
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
