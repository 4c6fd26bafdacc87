"""Serving A/B under concurrent load: fixed-bucket vs continuous batching.

Drives the serve.py service classes directly (no HTTP/PNG layer — on a
1-core host the PNG encode would serialize and mask the device-side
difference; serve.py's own elapsed_ms covers the end-to-end path) with
``--clients`` threads each firing ``--requests_per_client`` single-image
requests back to back, and reports throughput + latency percentiles per
mode. The continuous mode's win is the point of the experiment: the bucket
server runs one request's whole trajectory at a time while others queue;
the slot server advances ALL in-flight requests with every device step.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serving.py \
        --config_path configs/uvit_celeba.yaml --random_init \
        --clients 8 --requests_per_client 4 --slots 8

Prints one JSON line per mode:
    {"mode": "bucket", "throughput_img_s": ..., "p50_ms": ..., ...}
"""

import argparse
import json
import os
import sys
import threading
import time

# repo root (serve.py is a top-level script), independent of the cwd
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--method", type=str, default="dpm")
    p.add_argument("--steps", type=int, default=None,
                   help="solver steps; default 20 for ddim/dpm, "
                        "num_timesteps for ddpm (the full reverse process, "
                        "which serve.py's validation requires)")
    p.add_argument("--num_timesteps", type=int, default=1000)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests_per_client", type=int, default=4)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--steps_per_poll", type=int, default=5)
    p.add_argument("--bucket", type=int, default=1)
    p.add_argument("--attn_impl", type=str, default=None)
    p.add_argument("--gelu_approx", action="store_true")
    p.add_argument("--int8_scales", type=str, default=None)
    p.add_argument("--cache_every", type=int, default=None,
                   help="block caching in both serving modes (continuous "
                        "admissions become phase-aligned)")
    p.add_argument("--cache_outer", type=int, default=None)
    p.add_argument("--cache_schedule", type=str, default=None,
                   help="derived anchor table (bucket mode; slots mode "
                        "folds periodic tables — serve.py --cache_schedule)")
    p.add_argument("--cache_pattern", type=str, default=None,
                   help="wave-index anchor pattern, e.g. '1,0,1,0' "
                        "(serve.py --cache_pattern)")
    p.add_argument("--static_schedule", type=str, default=None,
                   help="serve the static-exit buckets (EarlyExitUViT "
                        "checkpoint; bucket mode only — serve.py "
                        "--static_schedule)")
    p.add_argument("--modes", type=str, default="bucket,continuous")
    return p.parse_args(argv)


def run_load(service, clients: int, per_client: int):
    """clients threads x per_client sequential single-image requests."""
    latencies = []
    lock = threading.Lock()

    def client(cid):
        for r in range(per_client):
            tic = time.time()
            service.sample(n=1, seed=cid * 1000 + r)
            dt = (time.time() - tic) * 1e3
            with lock:
                latencies.append(dt)

    threads = [
        threading.Thread(target=client, args=(c,)) for c in range(clients)
    ]
    tic = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - tic
    return wall, sorted(latencies)


def main(argv=None):
    args = get_args(argv)
    if args.steps is None:
        args.steps = args.num_timesteps if args.method == "ddpm" else 20
    import serve as serve_cli

    base_flags = [
        "--config_path", args.config_path,
        "--method", args.method,
        "--steps", str(args.steps),
        "--num_timesteps", str(args.num_timesteps),
    ]
    if args.random_init:
        base_flags += ["--random_init"]
    if args.checkpoint_path:
        base_flags += ["--checkpoint_path", args.checkpoint_path]
    if args.attn_impl:
        base_flags += ["--attn_impl", args.attn_impl]
    if args.gelu_approx:
        base_flags += ["--gelu_approx"]
    if args.int8_scales:
        base_flags += ["--int8_scales", args.int8_scales]
    if args.cache_every is not None:
        base_flags += ["--cache_every", str(args.cache_every)]
    if args.cache_outer is not None:
        base_flags += ["--cache_outer", str(args.cache_outer)]
    if args.cache_schedule is not None:
        base_flags += ["--cache_schedule", args.cache_schedule]
    if args.cache_pattern is not None:
        base_flags += ["--cache_pattern", args.cache_pattern]
    if args.static_schedule is not None:
        base_flags += ["--static_schedule", args.static_schedule]

    modes = args.modes.split(",")
    if args.static_schedule is not None and "continuous" in modes:
        # validate up front: ContinuousSamplerService would SystemExit
        # AFTER the bucket pass burned its benchmark minutes
        print("--static_schedule is fixed-bucket only; dropping the "
              "'continuous' mode from this run", file=sys.stderr)
        modes = [m for m in modes if m != "continuous"]

    n_total = args.clients * args.requests_per_client
    results = {}
    for mode in modes:
        if mode == "bucket":
            flags = base_flags + ["--bucket", str(args.bucket)]
            svc = serve_cli.SamplerService(serve_cli.get_args(flags))
        elif mode == "continuous":
            flags = base_flags + [
                "--slots", str(args.slots),
                "--steps_per_poll", str(args.steps_per_poll),
            ]
            svc = serve_cli.ContinuousSamplerService(serve_cli.get_args(flags))
        else:
            raise SystemExit(f"unknown mode {mode}")
        tic = time.time()
        svc.warmup()
        print(f"[{mode}] warmup {time.time() - tic:.1f}s", file=sys.stderr)
        # measured pass after a touch pass (compile + caches warm)
        run_load(svc, args.clients, 1)
        wall, lat = run_load(svc, args.clients, args.requests_per_client)
        out = {
            "mode": mode,
            "clients": args.clients,
            "requests": n_total,
            "throughput_img_s": round(n_total / wall, 3),
            "wall_s": round(wall, 3),
            "p50_ms": round(lat[len(lat) // 2], 1),
            "p90_ms": round(lat[int(len(lat) * 0.9)], 1),
            "max_ms": round(lat[-1], 1),
            "method": args.method,
            "steps": args.steps,
            "cache_every": args.cache_every,
        }
        results[mode] = out
        print(json.dumps(out))
        svc.close()
    if {"bucket", "continuous"} <= results.keys():
        speedup = (results["continuous"]["throughput_img_s"]
                   / results["bucket"]["throughput_img_s"])
        print(json.dumps({
            "continuous_vs_bucket_throughput": round(speedup, 2),
            "p50_latency_ratio": round(
                results["continuous"]["p50_ms"]
                / results["bucket"]["p50_ms"], 2),
        }))


if __name__ == "__main__":
    main()
