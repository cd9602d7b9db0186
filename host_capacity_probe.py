"""Parallel-capacity monitor: every 60 s, measure aggregate sha256
throughput at 1 and at 8 threads (1 s each). If the 8-thread aggregate is
<< 8x the 1-thread rate, the sandbox's effective parallel capacity — not
the job under test — caps multi-core scaling; the trace lets the
executor-scaling analysis normalize walls by capacity actually available
during each arm. ~3% average CPU duty; runs at normal priority on purpose
(it must compete exactly like an executor thread would)."""
import hashlib, json, sys, threading, time

def burn(seconds):
    buf = b"x" * (1 << 20)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        hashlib.sha256(buf).digest()
        n += 1
    return n / (time.perf_counter() - t0)

def agg(k, seconds=1.0):
    out = [0.0] * k
    def w(i):
        out[i] = burn(seconds)
    ts = [threading.Thread(target=w, args=(i,)) for i in range(k)]
    for t in ts: t.start()
    for t in ts: t.join()
    return sum(out)

while True:
    r1 = burn(1.0)
    r8 = agg(8)
    print(json.dumps({"ts": round(time.time(), 1), "hps_1t": round(r1, 1),
                      "hps_8t": round(r8, 1),
                      "par_eff_8t": round(r8 / (8 * r1), 3)}), flush=True)
    time.sleep(60)
