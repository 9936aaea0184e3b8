"""Profile flagship inference and print per-op device time.

Captures a jax.profiler trace of the bench.py workload and aggregates
device-side op durations from the trace JSON (the reliable path through
the tunneled TPU: parse plugins/profile/*/\*.trace.json.gz directly).

Usage: python tools/profile_inference.py [--batch 16] [--iters 3]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    os.environ["BENCH_BATCH"] = str(args.batch)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ampis_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from ampis_tpu.input.transforms import (get_resize_shape,
                                            pad_to_canvas_shape,
                                            preprocess_image)
    from ampis_tpu.models.mask_rcnn import MaskRCNN, init_params

    raw_h, raw_w = 1024, 1536
    new_shape = get_resize_shape(raw_h, raw_w, 800, 1333)
    canvas = pad_to_canvas_shape(*new_shape)
    # BENCH_INT8=static profiles the int8 mask head using the scales
    # bench.py cached in bench_quant_scales.json (run bench first)
    kw = {}
    int8_env = os.environ.get("BENCH_INT8")
    if int8_env is not None:
        kw["int8_mask_head"] = ("static" if int8_env == "static"
                                else bool(int(int8_env)))
    model = MaskRCNN(num_classes=1, detections_per_image=400,
                     dtype=jnp.bfloat16, **kw)
    params = init_params(model, jax.random.PRNGKey(0))
    if kw.get("int8_mask_head") == "static":
        import flax
        cache = json.loads((Path(__file__).parents[1] /
                            "bench_quant_scales.json").read_text())
        flat = {tuple(k.split("/")): jnp.asarray(v, jnp.float32)
                for k, v in next(iter(cache.values())).items()}
        params = {**params,
                  "quant": flax.traverse_util.unflatten_dict(flat)}
    rs = np.random.RandomState(0)
    raw = rs.randint(0, 255, (args.batch, raw_h, raw_w, 3), np.uint8)
    mean, std = (103.53, 116.28, 123.675), (1.0, 1.0, 1.0)

    @jax.jit
    def run(params, images):
        batch = jax.vmap(
            lambda im: preprocess_image(im, new_shape, canvas, mean, std)
        )(images)
        sizes = jnp.tile(jnp.asarray([new_shape], jnp.float32),
                         (images.shape[0], 1))
        return model.apply(params, batch, sizes, method=MaskRCNN.inference)

    images = jax.device_put(jnp.asarray(raw))
    out = run(params, images)
    np.asarray(out["scores"]).sum()  # warm

    logdir = args.logdir or tempfile.mkdtemp(prefix="ampis_prof_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.iters):
        out = run(params, images)
    np.asarray(out["scores"]).sum()
    jax.profiler.stop_trace()

    traces = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")
    assert traces, f"no trace found under {logdir}"
    events = []
    for t in traces:
        with gzip.open(t, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))

    # device pids (TPU or CPU backend)
    pid_names = {e["pid"]: e["args"]["name"]
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    per_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            per_op[name] += dur
            total += dur
    print(f"# trace: {logdir}  device-op total {total:.1f} ms over "
          f"{args.iters} iters (batch {args.batch})")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{ms / args.iters:9.3f} ms/iter  {100 * ms / total:5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
