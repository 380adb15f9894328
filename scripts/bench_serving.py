"""Measure serving throughput under concurrency, micro-batching off vs on.

Starts the HTTP service in-process against the bundled demo checkpoint,
runs the two-pass protocol once, then fires concurrent /stylize requests
from N client threads and reports requests/sec for batch_window_ms in
{0, window}.  Run on the real TPU (idle host — HTTP/PNG codec work shares
the one CPU core):

    python scripts/bench_serving.py [--threads 8] [--requests 64]
                                    [--window-ms 5] [--size 256]
"""

import argparse
import json
import threading
import time
import urllib.request


def post(url, body, timeout=600):
    req = urllib.request.Request(
        url, data=body, method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="models/demo_plum_4000.msgpack")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument("--size", type=int, default=256,
                    help="content crop (HxW read from the ambush_4 fixture)")
    ap.add_argument("--dtype", default="f16")
    args = ap.parse_args()

    import cv2

    from rerevst_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    from rerevst_tpu.serve import serve

    frames = [cv2.imread(
        f"/root/reference/test/inputs/ambush_4/frame_{i:04d}.png")
        [: args.size, : args.size] for i in (1, 9, 17, 25, 33)]
    style = cv2.imread("/root/reference/test/inputs/plum_flower.jpg")

    def png(img):
        ok, buf = cv2.imencode(".png", img)
        assert ok
        return buf.tobytes()

    results = {}
    for window in (0.0, args.window_ms):
        server = serve(args.checkpoint, port=0, dtype=args.dtype,
                       batch_window_ms=window, batch_max=args.threads)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        host, port = server.server_address[:2]
        url = f"http://{host}:{port}"
        post(url + "/style", png(style))
        for i, f in enumerate(frames):
            post(url + f"/pass1?last={'1' if i == len(frames) - 1 else '0'}",
                 png(f))
        # Warm the batched-decode graphs for every batch size the coalescer
        # can form (1..threads) so the timed run measures steady state.
        for _ in range(2):
            errs = []

            def warm(i):
                try:
                    s, _ = post(url + "/stylize", png(frames[i % 5]))
                    assert s == 200
                except Exception as e:  # pragma: no cover
                    errs.append(e)

            ts = [threading.Thread(target=warm, args=(i,))
                  for i in range(args.threads)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert not errs, errs
        # (Sequential requests cannot warm other batch sizes — each
        # completes before the next arrives, so they always coalesce to
        # batch 1.  Power-of-2 bucketing bounds the distinct graph count
        # and the two timed rounds absorb any stray compile.)

        per_thread = args.requests // args.threads
        bodies = [png(f) for f in frames]
        errs = []

        def client(tid):
            try:
                for k in range(per_thread):
                    s, _ = post(url + "/stylize", bodies[(tid + k) % 5])
                    assert s == 200
            except Exception as e:  # pragma: no cover
                errs.append(e)

        # Two timed rounds; report the second (the first may still hit
        # in-loop compiles for coalesced batch sizes not seen in warmup —
        # the persistent compile cache makes round 2 steady-state).
        for _round in range(2):
            t0 = time.perf_counter()
            ts = [threading.Thread(target=client, args=(t,))
                  for t in range(args.threads)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            dt = time.perf_counter() - t0
            assert not errs, errs
        n = per_thread * args.threads
        results[f"window_{window:g}ms"] = {
            "requests": n, "wall_s": round(dt, 3),
            "req_per_s": round(n / dt, 2)}
        print(results[f"window_{window:g}ms"], flush=True)
        server.shutdown()

    off = results[f"window_{0.0:g}ms"]["req_per_s"]
    on = results[f"window_{args.window_ms:g}ms"]["req_per_s"]
    print(json.dumps({"threads": args.threads, "size": args.size,
                      "dtype": args.dtype, "results": results,
                      "speedup": round(on / off, 3)}))


if __name__ == "__main__":
    main()
