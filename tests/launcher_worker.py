"""Worker process for tests/test_launcher.py: one process of a 2-process
jax.distributed CPU render via parallel.launcher.run_multihost_render,
with an optional simulated crash for the resume test.

Invoked as:  python tests/launcher_worker.py --process-id K --num-processes P
                 --port PORT --spp S [--crash-at N] --out IMG.npy
                 [--checkpoint CK] [--checkpoint-every E]
"""
import argparse
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")   # before any backend init

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--crash-at", type=int, default=None,
                    help="os._exit(3) once this many passes are rendered "
                    "by THIS process (after its last checkpoint)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from montecarlo_pathtracing_tpu.parallel.launcher import (
        init_distributed, run_multihost_render)
    init_distributed(f"localhost:{args.port}",
                     args.num_processes, args.process_id)

    import numpy as np
    from montecarlo_pathtracing_tpu.scene import scenes
    from montecarlo_pathtracing_tpu.scene.device import compile_scene
    from montecarlo_pathtracing_tpu.render.renderer import (
        RenderConfig, Renderer)

    dev = compile_scene(scenes.build("box_diffuse"))
    # width > 32 so the default block32 pixel permutation is NON-trivial:
    # the round-2 launcher bug (missing inverse permutation) was invisible
    # at 32x24 because one block spans the whole width there.
    cfg = RenderConfig(width=64, height=48, nb_bounces=6,
                       passes_per_call=1, tile_rays=1 << 10)
    r = Renderer(dev, cfg)

    if args.crash_at is not None:
        orig_run = r.run

        def crashing_run(target):
            local_done = r.nb_passes - args.process_id * args.spp // \
                args.num_processes
            if local_done >= args.crash_at:
                os._exit(3)                 # simulated host failure
            return orig_run(target)

        r.run = crashing_run

    img = run_multihost_render(r, args.spp, checkpoint=args.checkpoint,
                               checkpoint_every=args.checkpoint_every)
    if jax.process_index() == 0:
        np.save(args.out, img)
    print(f"proc {args.process_id} done, {r.nb_passes} passes", flush=True)


if __name__ == "__main__":
    main()
