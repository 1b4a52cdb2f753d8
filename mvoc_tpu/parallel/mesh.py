"""Multi-chip sharding: mesh construction + NamedSharding rules.

The reference is strictly single-GPU (SURVEY.md §2.4: no torch.distributed /
NCCL anywhere); parallelism here is designed TPU-first instead of ported:

* mesh axes ("seq", "model"):
  - "seq":   the FRAME axis of video tensors (sequence/context parallelism
    for the temporal attention, which attends across frames per pixel).
    Spatial attention, resnets and convs are frame-local, so they run
    communication-free under this sharding; GSPMD inserts all-gathers on
    the frame axis only around temporal attention/temporal convs, and they
    ride ICI.
  - "model": tensor parallelism over channel dimensions of the big Dense/
    Conv kernels (Megatron-style split; GSPMD places the psum after the
    output projections).

* params: kernels are sharded on their output-channel dim over "model" when
  divisible; everything else is replicated.
* activations: [B, F, H, W, C] video tensors shard F over "seq" (and C over
  "model" where GSPMD chooses); branch batch B stays replicated (N+3 = 5 is
  not a power of two — frames are the clean data axis).

All collective insertion is delegated to GSPMD via jax.sharding +
NamedSharding (the scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEQ_AXIS = "seq"
MODEL_AXIS = "model"
JOB_AXIS = "job"


def make_mesh(
    n_devices: Optional[int] = None,
    seq: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    job: int = 1,
) -> Mesh:
    """Build a (job, seq, model) mesh over the available devices.

    "job" is data parallelism over INDEPENDENT videos (the MVOC workflow
    inverts N+1 source videos with identical schedules — reference loops
    them serially, inverse.py:136; here each job slice owns one video).
    Default job=1 reduces to the (seq, model) intra-step mesh.

    Default split: seq = min(n/job, 4) frames-parallel, model = rest.
    Single device degrades to a 1x1x1 mesh (all shardings become no-ops), so
    the same code path runs on 1 real TPU chip and the virtual 8-CPU CI mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % job == 0, f"job axis {job} must divide device count {n}"
    per_job = n // job
    if seq is None:
        seq = min(per_job, 4)
        while per_job % seq != 0:
            seq //= 2
    model = per_job // seq
    arr = np.asarray(devices).reshape(job, seq, model)
    return Mesh(arr, (JOB_AXIS, SEQ_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def video_sharding(mesh: Mesh, frame_axis: int = 1, ndim: int = 5) -> NamedSharding:
    """Shard the frame axis of [B, F, H, W, C]-style tensors over "seq"."""
    spec = [None] * ndim
    spec[frame_axis] = SEQ_AXIS
    return NamedSharding(mesh, P(*spec))


def _kernel_spec(path_names: tuple[str, ...], shape: tuple[int, ...], model_size: int):
    """Output-channel TP for large kernels; replicate the rest.

    Megatron pairing: to_q/to_k/to_v + ff in-proj split on OUT channels,
    to_out/ff out-proj split on IN channels, so each attention/MLP block
    needs exactly one psum (inserted by GSPMD)."""
    name = path_names[-2] if len(path_names) >= 2 else ""
    leaf = path_names[-1]
    if leaf != "kernel" or len(shape) < 2 or model_size == 1:
        return P()
    out_dim, in_dim = shape[-1], shape[-2]
    col_split = ("to_q", "to_k", "to_v", "net_0_proj", "mlp_fc1", "q_proj",
                 "k_proj", "v_proj", "linear_1")
    row_split = ("to_out_0", "net_2", "mlp_fc2", "out_proj", "linear_2")
    if name in col_split and out_dim % model_size == 0:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    if name in row_split and in_dim % model_size == 0:
        return P(*([None] * (len(shape) - 2) + [MODEL_AXIS, None]))
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree on the mesh with TP shardings.

    int8-quantized kernels (ops/quantize.QuantizedTensor leaves) shard
    like their fp counterparts: the int8 data takes the kernel's TP spec;
    the per-channel scale keeps only the spec axes where it has real
    (non-broadcast) extent.  The int32 accumulation is associative, so a
    TP-sharded w8a8 matmul is bit-exact vs single-device."""
    from mvoc_tpu.ops.quantize import QuantizedTensor

    model_size = mesh.shape[MODEL_AXIS]

    flat, treedef = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    placed = []
    for path, leaf in flat:
        names = tuple(
            p.key if isinstance(p, jax.tree_util.DictKey) else str(p) for p in path
        )
        if isinstance(leaf, QuantizedTensor):
            spec = _kernel_spec(names, leaf.data.shape, model_size)
            parts = tuple(spec) + (None,) * (leaf.data.ndim - len(tuple(spec)))
            scale_parts = tuple(
                ax if leaf.scale.shape[i] != 1 else None
                for i, ax in enumerate(parts))
            placed.append(QuantizedTensor(
                jax.device_put(leaf.data, NamedSharding(mesh, P(*parts))),
                jax.device_put(leaf.scale, NamedSharding(mesh, P(*scale_parts)))))
            continue
        spec = _kernel_spec(names, np.shape(leaf), model_size)
        placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)


def shard_video(x: jax.Array, mesh: Mesh, frame_axis: int = 1) -> jax.Array:
    if x.shape[frame_axis] % mesh.shape[SEQ_AXIS] != 0:
        return jax.device_put(x, replicated(mesh))
    return jax.device_put(x, video_sharding(mesh, frame_axis, x.ndim))


def shard_stacked_video(
    x: jax.Array, mesh: Mesh, job_axis: int = 0, frame_axis: int = 1
) -> jax.Array:
    """Shard a stack of per-video tensors [J, F, h, w, C]: the video axis
    over "job" (independent-video data parallelism) and the frame axis over
    "seq".  Axes that don't divide evenly stay replicated."""
    spec = [None] * x.ndim
    if mesh.shape[JOB_AXIS] > 1 and x.shape[job_axis] % mesh.shape[JOB_AXIS] == 0:
        spec[job_axis] = JOB_AXIS
    if x.shape[frame_axis] % mesh.shape[SEQ_AXIS] == 0:
        spec[frame_axis] = SEQ_AXIS
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
