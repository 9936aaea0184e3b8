"""Worker for the 2-process data-parallel test (SURVEY.md §5: ICI + DCN).

Each process owns 4 virtual CPU devices; jax.distributed.initialize joins
them into one 8-device mesh spanning both processes (the DCN topology on
real multi-host TPU slices). One sharded loss+grad step of the full Mask
R-CNN runs over the global mesh; every process prints the (identical)
global loss.

Usage: multihost_dp_worker.py <coordinator_port> <process_id> <n_processes>
"""
import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from ampis_tpu.models.mask_rcnn import MaskRCNN, init_params  # noqa: E402
from ampis_tpu.parallel.mesh import (batch_sharding, data_parallel_mesh,
                                     replicated)  # noqa: E402


def main():
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4
    mesh = data_parallel_mesh()
    assert mesh.size == 4 * nproc

    model = MaskRCNN(
        num_classes=1, dtype=jnp.float32,
        pre_nms_topk_train=64, post_nms_topk_train=32,
        pre_nms_topk_test=64, post_nms_topk_test=32,
        detections_per_image=8, roi_batch_per_image=16,
        mask_rois_per_image=4, roi_chunk=32)
    params = init_params(model, jax.random.PRNGKey(0))

    # global batch: one image per global device; every process computes the
    # full batch deterministically and contributes its local shard
    b, h, w, g = mesh.size, 64, 64, 2
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.rand(b, h, w, 3).astype(np.float32),
        "sizes": np.tile([[h, w]], (b, 1)).astype(np.float32),
        "gt_boxes": np.tile([[8, 8, 40, 40], [20, 20, 60, 50]],
                            (b, 1, 1)).astype(np.float32),
        "gt_classes": np.zeros((b, g), np.int32),
        "gt_valid": np.ones((b, g), bool),
        "gt_masks": np.zeros((b, g, h, w), np.uint8),
    }
    batch["gt_masks"][:, 0, 8:40, 8:40] = 1
    batch["gt_masks"][:, 1, 20:50, 20:60] = 1

    batch_sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x, sharding):
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    arrs = {k: put(v, batch_sh) for k, v in batch.items()}
    params = jax.tree.map(lambda x: put(np.asarray(x), rep), params)

    # Global arrays span non-addressable devices: they must be jit
    # ARGUMENTS, not closed-over constants.
    def loss_fn(p, a):
        losses = model.apply(p, a["images"], a["sizes"],
                             a["gt_boxes"], a["gt_classes"],
                             a["gt_valid"], a["gt_masks"],
                             jax.random.PRNGKey(1),
                             method=MaskRCNN.losses)
        return sum(losses.values())

    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, arrs)
        gnorm = jax.jit(
            lambda g: jnp.sqrt(sum(jnp.vdot(x, x)
                                   for x in jax.tree.leaves(g))))(grads)
        loss = float(loss)
        gnorm = float(gnorm)
    assert np.isfinite(loss) and np.isfinite(gnorm)
    # the all-reduced loss/grads are identical on every process; the test
    # runner cross-checks these lines between workers
    print(f"MULTIHOST_LOSS {loss:.6f} GNORM {gnorm:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
