"""Headline benchmark: zero-shot candidate-ranking throughput.

Measures the framework's hot path — scoring per-query candidate lists with
the Extractor + generated relation vectors (mre_tpu/eval/zero_shot.py) — on
the available accelerator, against a faithful PyTorch-CPU re-enactment of
the reference's per-query host loop (module/zsl_module.py:656-726: per
candidate list build meta tensors → Extractor forward → cosine → argsort).

Workload shape matches the task: each query ranks ONE head entity against a
candidate list (rel2candidates), so device paths get blocks (heads [Q],
cands [Q, C]) — exactly what the production evaluator streams
(eval/zero_shot.py::_rank_stream_block).

Timing: the ranking body runs REPS times inside one jit (lax.scan with a
rep-index perturbation of the entity ids so XLA cannot CSE the repeats).
The production evaluator ranks its ~17.6k-query workload in one program, so
per-program dispatch is amortized to nothing there; the single-dispatch and
transfer-included variants are still reported as disclosure fields.

Prints ONE JSON line:
  {"metric": "zsl_candidate_ranking_throughput", "value": <triples/sec>,
   "unit": "triples/sec", "vs_baseline": <speedup vs torch-cpu reference>}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# workload at FB15K-237-ZS scale (BASELINE.md)
EMB_DIM = 200
MAX_NEIGHBOR = 50
N_SYMBOLS = 14208 + 235
N_ENTS = 14208
C = 301                    # candidates per query (true + 300)
Q_DEVICE = int(os.environ.get("BENCH_Q", "2048"))  # queries per program
CHUNK = int(os.environ.get("BENCH_CHUNK", "128"))  # scan step width
REPS = int(os.environ.get("BENCH_REPS", "10"))     # in-program repetitions
if Q_DEVICE % CHUNK:
    raise SystemExit(f"BENCH_Q={Q_DEVICE} must be a multiple of "
                     f"BENCH_CHUNK={CHUNK} (scan over fixed-width chunks)")
Q_BASELINE = 64            # queries timed on the torch-cpu reference path
TEST_SAMPLE = 20


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_workload(seed=0):
    """Workload with the task's real sharing structure: queries of one
    relation rank the SAME rel2candidates list (gen_mode_candidates.py), so
    each CHUNK-query block shares one candidate row (conservative: real
    FB15K-237-ZS has ~600 queries/relation, 4.7x this block). All device
    paths rank the identical (head, candidate) pairs."""
    rng = np.random.default_rng(seed)
    symbols = rng.normal(size=(N_SYMBOLS + 1, EMB_DIM)).astype(np.float32)
    connections = rng.integers(0, N_SYMBOLS, (N_ENTS, MAX_NEIGHBOR, 2)).astype(np.int32)
    degrees = rng.integers(1, MAX_NEIGHBOR, N_ENTS).astype(np.float32)
    rel_vecs = rng.normal(size=(TEST_SAMPLE, EMB_DIM)).astype(np.float32)
    heads = rng.integers(0, N_ENTS, Q_DEVICE).astype(np.int32)
    n_chunks = Q_DEVICE // CHUNK
    cands_shared = rng.integers(0, N_ENTS, (n_chunks, C)).astype(np.int32)
    cands = np.broadcast_to(cands_shared[:, None, :],
                            (n_chunks, CHUNK, C)).reshape(Q_DEVICE, C).copy()
    return symbols, connections, degrees, rel_vecs, heads, cands


# FLOPs per ranked triple, per path: the SupportEncoder costs two d→2d→2d→d
# matmuls (8·d²); the rel-shared path amortizes the first matmul over the
# shared candidate list (reference structure), leaving the second (4·d²)
# plus the per-head first matmul (4·d²/C) and pointwise (~16·d).
PATH_FLOPS = {
    "factored": 8 * EMB_DIM * EMB_DIM + 16 * EMB_DIM,
    "head_shared": 8 * EMB_DIM * EMB_DIM + 16 * EMB_DIM,
    "rel_shared": 4 * EMB_DIM * EMB_DIM + (4 * EMB_DIM * EMB_DIM) // C
    + (4 * EMB_DIM * EMB_DIM) // CHUNK + 16 * EMB_DIM,
}
PEAK_TFLOPS = {"float32": 49.0, "bfloat16": 197.0}   # v5e single chip


def run_device(symbols, connections, degrees, rel_vecs, heads, cands):
    import jax
    import jax.numpy as jnp

    from mre_tpu.eval.zero_shot import _score_and_rank
    from mre_tpu.models.extractor import Extractor

    extractor = Extractor(embed_dim=EMB_DIM)
    symbols_d = jnp.asarray(symbols)
    conns_d = jnp.asarray(connections)
    degs_d = jnp.asarray(degrees)
    dummy = jnp.asarray(np.stack([heads[:2], cands[0, :2]], 1))
    meta0 = (conns_d[jnp.zeros(2, jnp.int32)], degs_d[jnp.zeros(2, jnp.int32)],
             conns_d[jnp.zeros(2, jnp.int32)], degs_d[jnp.zeros(2, jnp.int32)])
    params = extractor.init({"params": jax.random.key(0)}, symbols_d, dummy,
                            dummy, meta0, meta0, True)["params"]

    # per-entity neighbor encodings + factored pair tables precomputed once
    # per evaluation (extractor.precompute_pair_tables): the per-pair cost is
    # one L[e1]+R[e2] add + the SupportEncoder.
    ent_sym = jnp.asarray(235 + np.arange(N_ENTS, dtype=np.int32))

    def _tables():
        nbr = extractor.apply({"params": params}, symbols_d, conns_d, degs_d,
                              method=extractor.encode_neighbors)
        return extractor.apply({"params": params}, symbols_d, nbr, ent_sym,
                               method=extractor.precompute_pair_tables)

    L32, R32 = jax.jit(_tables)()

    chunk = CHUNK
    n_chunks = Q_DEVICE // chunk
    rel_vecs_d = jnp.asarray(rel_vecs)
    # staged device-resident inputs (the production evaluator keeps its
    # whole padded stream device-resident; transfer-included variants below)
    heads_c = jnp.asarray(heads.reshape(n_chunks, chunk))
    cands_c = jnp.asarray(cands.reshape(n_chunks, chunk, C))
    # rel-shared layout: ONE candidate row per chunk (make_workload builds
    # the chunks with identical per-query lists, the task's real structure)
    cands_r = jnp.asarray(cands.reshape(n_chunks, chunk, C)[:, 0, :])

    def build(dtype, path):
        """Whole-workload programs for one (dtype, path) combination.

        Returns (ranks_fn, timed_fn): ranks_fn computes the ranks once;
        timed_fn runs the identical body REPS times in-program with a
        rep-index perturbation of the entity ids (defeats CSE)."""
        cdt = jnp.dtype(dtype)
        Ld, Rd = L32.astype(cdt), R32.astype(cdt)
        pd = jax.tree_util.tree_map(lambda x: x.astype(cdt), params)
        ones = jnp.ones((chunk, C), bool)

        def body(hd, cd):
            if path == "rel_shared":
                emb = extractor.apply({"params": pd}, Ld, Rd, hd, cd,
                                      method=extractor.embed_pairs_rel_shared)
            elif path == "head_shared":
                emb = extractor.apply({"params": pd}, Ld, Rd, hd, cd,
                                      method=extractor.embed_pairs_head_shared)
            else:
                emb = extractor.apply(
                    {"params": pd}, Ld, Rd,
                    jnp.repeat(hd, C), cd.reshape(-1),
                    method=extractor.embed_pairs_factored).reshape(chunk, C, EMB_DIM)
            return _score_and_rank(emb.astype(jnp.float32), rel_vecs_d, ones)

        @jax.jit
        def ranks_fn(heads_c, cands_c):
            def step(_, x):
                hd, cd = x
                return None, body(hd, cd)
            _, ranks = jax.lax.scan(step, None, (heads_c, cands_c))
            return ranks.reshape(-1)

        @jax.jit
        def timed_fn(heads_c, cands_c):
            def rep(acc, i):
                def step(a, x):
                    hd, cd = x
                    hd = (hd + i) % N_ENTS
                    cd = (cd + i) % N_ENTS
                    return a + body(hd, cd).sum(), None
                a, _ = jax.lax.scan(step, jnp.zeros((), jnp.int32),
                                    (heads_c, cands_c))
                return acc + a, None
            acc, _ = jax.lax.scan(rep, jnp.zeros((), jnp.int32),
                                  jnp.arange(REPS))
            return acc

        return ranks_fn, timed_fn

    def best_of(fn, *args, n=3):
        jax.block_until_ready(fn(*args))            # compile/warm
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    built = {}   # (dtype, path) -> (ranks_fn, timed_fn): the e2e section
                 # reuses the compiled program instead of re-jitting it
                 # (a rebuilt wrapper recompiles minutes of identical HLO
                 # through the remote-compile tunnel)
    for dtype in ("float32", "bfloat16"):
        for path in ("factored", "head_shared", "rel_shared"):
            ranks_fn, timed_fn = built[(dtype, path)] = build(dtype, path)
            cands_in = cands_r if path == "rel_shared" else cands_c
            log(f"device[{dtype}/{path}]: compiling...")
            ranks = np.asarray(jax.block_until_ready(ranks_fn(heads_c, cands_in)))
            t_once = best_of(ranks_fn, heads_c, cands_in)     # single dispatch
            t_reps = best_of(timed_fn, heads_c, cands_in)     # REPS in-program
            tput = Q_DEVICE * C * REPS / t_reps
            key = f"{dtype[0] == 'b' and 'bf16' or 'f32'}_{path}"
            flops = PATH_FLOPS[path]
            results[key] = {
                "triples_per_sec": tput,
                "triples_per_sec_single_dispatch": Q_DEVICE * C / t_once,
                "ranks": ranks,
                "achieved_tflops": tput * flops / 1e12,
                "mfu": tput * flops / 1e12 / PEAK_TFLOPS[dtype],
            }
            log(f"device[{dtype}/{path}]: {tput:,.0f} triples/sec in-program "
                f"({results[key]['achieved_tflops']:.2f} TFLOP/s, MFU "
                f"{results[key]['mfu']*100:.1f}%); single-dispatch "
                f"{results[key]['triples_per_sec_single_dispatch']:,.0f}")

    # transfer-included variants on the fastest path (rel_shared bf16):
    # (a) unoverlapped: whole-workload host→device copy inside the timed
    #     region; (b) overlapped: slab double-buffered device_put. The
    #     rel-shared layout also shrinks the transfer itself: one shared
    #     candidate row per chunk instead of chunk copies (the production
    #     host pipeline streams exactly this).
    ranks_fn, _ = built[("bfloat16", "rel_shared")]
    cands_r_np = np.ascontiguousarray(np.asarray(cands_r))

    def run_e2e():
        hc = jnp.asarray(heads.reshape(n_chunks, chunk))
        cc = jnp.asarray(cands_r_np)
        return jax.block_until_ready(ranks_fn(hc, cc))

    t = best_of(run_e2e, n=2)
    results["e2e_unoverlapped_tps"] = Q_DEVICE * C / t

    # Slab-granular double buffering: cut the workload into S slabs, issue
    # the (async) device_put for slab i+1 before dispatching compute on
    # slab i, one scanned program per slab. Per-chunk staging measured
    # 383k tps through the relay tunnel (round 3): the ~50-100 ms round
    # trip per 128-query chunk swamps its ~0.6 ms of compute — round-trip
    # COUNT, not bandwidth, is the tunnel's cost. The right slab count is
    # transport-dependent (relay tunnel: 1-2; local PCIe: finer), so it is
    # AUTOTUNED here over the divisors of the chunk count and the best
    # measured grain is reported (round-3 regression: a fixed S=4 ran 4x
    # slower than no overlap at all through the tunnel).
    def overlapped_runner(S):
        h_sl = np.ascontiguousarray(heads.reshape(S, n_chunks // S, chunk))
        c_sl = np.ascontiguousarray(cands_r_np.reshape(S, n_chunks // S, C))

        def run_overlapped():
            bufs = [(jax.device_put(h_sl[0]), jax.device_put(c_sl[0]))]
            outs = []
            for i in range(S):
                if i + 1 < S:
                    bufs.append((jax.device_put(h_sl[i + 1]),
                                 jax.device_put(c_sl[i + 1])))
                hi, ci = bufs[i]
                outs.append(ranks_fn(hi, ci))
            return jax.block_until_ready(outs)

        return run_overlapped

    slab_tps = {}
    for S in (1, 2, 4, 8):
        if n_chunks % S:
            continue
        t = best_of(overlapped_runner(S), n=2)
        slab_tps[S] = Q_DEVICE * C / t
        log(f"e2e overlapped S={S}: {slab_tps[S]:,.0f} triples/sec")
    best_S = max(slab_tps, key=slab_tps.get)
    results["e2e_overlapped_tps"] = slab_tps[best_S]
    results["overlap_slabs"] = best_S
    results["e2e_overlapped_by_slabs"] = {str(k): round(v, 1)
                                          for k, v in slab_tps.items()}
    log(f"e2e: unoverlapped {results['e2e_unoverlapped_tps']:,.0f}, "
        f"overlapped(best S={best_S}) {results['e2e_overlapped_tps']:,.0f} "
        "triples/sec")

    # quality parity across dtype/path (same workload → same metrics)
    path_keys = [k for k in results if "_" in k and k.split("_", 1)[0] in ("f32", "bf16")]
    r_ref = results["f32_factored"]["ranks"]
    for key in path_keys:
        if key == "f32_factored":
            continue
        r = results[key]["ranks"]
        results[key]["rank_match_vs_f32_factored"] = float(np.mean(r == r_ref))
    for key in path_keys:
        ranks = results[key]["ranks"]
        results[key]["hits10"] = float(np.mean(ranks <= 10))
        results[key]["hits5"] = float(np.mean(ranks <= 5))
        results[key]["mrr"] = float(np.mean(1.0 / ranks))
    return results


def run_torch_baseline(symbols, connections, degrees, rel_vecs, heads, cands):
    """Reference-shaped per-query loop on torch CPU (zsl_module.py:656-726)."""
    import torch

    torch.manual_seed(0)

    class RefExtractor(torch.nn.Module):
        def __init__(self):
            super().__init__()
            d = EMB_DIM
            self.emb = torch.nn.Embedding(N_SYMBOLS + 1, d)
            self.emb.weight.data.copy_(torch.from_numpy(symbols))
            self.emb.weight.requires_grad = False
            self.gcn_w = torch.nn.Linear(d, d // 2)
            self.fc1 = torch.nn.Linear(d, d // 2)
            self.fc2 = torch.nn.Linear(d, d // 2)
            self.reshape_layer = torch.nn.Linear(2 * d, d)
            self.proj1 = torch.nn.Linear(d, 2 * d)
            self.proj2 = torch.nn.Linear(2 * d, d)
            self.ln = torch.nn.LayerNorm(d)

        def neighbor(self, conn, deg):
            e = self.emb(conn[:, :, 1])
            out = self.gcn_w(e).sum(1) / deg.unsqueeze(1)
            return out.tanh()

        def forward(self, query, meta):
            lc, ld, rc, rd = meta
            e = torch.cat([self.fc1(self.emb(query[:, 0])),
                           self.fc2(self.emb(query[:, 1]))], -1).tanh()
            x = torch.cat([self.neighbor(lc, ld), e, self.neighbor(rc, rd)], -1)
            x = self.reshape_layer(x)
            return self.ln(self.proj2(torch.relu(self.proj1(x))) + x)

    model = RefExtractor().eval()
    conn_t = torch.from_numpy(connections)
    deg_t = torch.from_numpy(degrees)

    def meta_for(hs, cs):
        # per-query host stacking, as the reference's get_meta does: the
        # head's connection row is stacked once per candidate
        lc = torch.stack([conn_t[i] for i in hs])
        rc = torch.stack([conn_t[i] for i in cs])
        ld = torch.tensor([float(deg_t[i]) for i in hs])
        rd = torch.tensor([float(deg_t[i]) for i in cs])
        return lc, ld, rc, rd

    def query_tensor(q):
        hs = np.full(C, 235 + heads[q], np.int64)
        cs = 235 + cands[q].astype(np.int64)
        return (torch.from_numpy(np.stack([hs, cs], 1)),
                meta_for(np.full(C, heads[q]), cands[q]))

    # warmup (thread-pool spinup / first-call allocs), excluded from timing
    with torch.no_grad():
        _ = model(*query_tensor(0))

    t0 = time.perf_counter()
    with torch.no_grad():
        for q in range(Q_BASELINE):
            query, meta = query_tensor(q)
            emb = model(query, meta).numpy()
            # cosine vs TEST_SAMPLE relation vectors, mean, argsort (host)
            a = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
            b = rel_vecs / np.maximum(np.linalg.norm(rel_vecs, axis=1, keepdims=True), 1e-12)
            scores = (a @ b.T).mean(1)
            order = list(np.argsort(scores))[::-1]
            _ = order.index(0) + 1
    dt = time.perf_counter() - t0
    return Q_BASELINE * C / dt


def load_trained_cert():
    """Trained-embedding fidelity certificate for the eval hot path
    (experiments/zsl_learnability.py --cert_out, run on the TPU by the
    round-4 queue). The random-workload gate below is necessary but weak
    (near-tied random scores shuffle freely); this certificate carries the
    metric deltas measured on TRAINED weights and gates dtype/path
    eligibility for the headline."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "experiments", "results", "bf16_cert.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


AXON_CLIENT_LOCK = "/tmp/axon_client.lock"


def _backend_reachable(have_lock: bool = False) -> bool:
    """Probe the default backend in a short-timeout subprocess. A wedged
    axon tunnel hangs ``jax.devices()`` indefinitely (the round-4
    MULTICHIP_r04 rc=124 failure mode) — the bench process itself must
    never initialize a backend it hasn't probed.

    ``have_lock``: when this process already holds the axon client lock
    (acquired or inherited), the probe must NOT re-flock the lock file —
    flock is per open-file-description, so a fresh open would block on our
    own held lock and mis-read "busy" as "backend down" (the round-5
    bench_r5 CPU-fallback bug)."""
    import subprocess
    try:
        # The inner `timeout -k` kills the hung python itself: a
        # subprocess-level timeout would only kill flock and orphan the
        # wedged client.
        cmd = ["timeout", "-k", "5", "240", sys.executable, "-c",
               "import jax; jax.numpy.add(1, 1)"]
        if not have_lock:
            # flock: serialize with the watchdog/supervisor probes — two
            # concurrent axon clients are themselves a wedge trigger.
            cmd = ["flock", "-w", "120", AXON_CLIENT_LOCK] + cmd
        proc = subprocess.run(cmd, env=dict(os.environ),
                              capture_output=True, timeout=420)
        return proc.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _inherited_lock_fd():
    """The supervisor's job wrapper holds the axon client lock on fd 9 for
    the job's lifetime (tpu_supervisor3.sh:108-112). When this bench runs AS
    a queue job it inherits that fd and therefore already owns the lock —
    acquiring it again (or preempting "the current job", which is ourselves)
    would deadlock/self-kill."""
    try:
        if os.readlink("/proc/self/fd/9") == AXON_CLIENT_LOCK:
            return 9
    except OSError:
        pass
    return None


def _ancestor_pids():
    anc, p = set(), os.getpid()
    while p > 1:
        anc.add(p)
        try:
            with open(f"/proc/{p}/status") as st:
                p = int(next(ln for ln in st
                             if ln.startswith("PPid:")).split()[1])
        except (OSError, StopIteration, ValueError):
            break
    return anc


def _acquire_axon_client_lock(wait_s=900):
    """Single-client discipline for the axon tunnel: two concurrent clients
    wedge it (observed round 3/4). Every long-lived client — supervisor
    queue jobs, this bench — holds /tmp/axon_client.lock for its lifetime.
    The bench is the round's headline artifact, so it PREEMPTS a running
    queue job (all jobs checkpoint/resume) and then takes the lock; the
    supervisor's relaunch waits politely on the same lock."""
    import fcntl
    import signal
    try:
        with open("/tmp/q_current.pid") as f:
            job_pid = int(f.read().strip())
        os.kill(job_pid, 0)  # raises if dead
        if job_pid in _ancestor_pids():
            log("bench: current queue job is our own ancestry; not preempting")
            raise ValueError
        log(f"bench: preempting supervisor job pid {job_pid} (it will resume)")
        try:
            os.killpg(os.getpgid(job_pid), signal.SIGTERM)
        except (ProcessLookupError, PermissionError):
            os.kill(job_pid, signal.SIGTERM)
        time.sleep(10)
    except (OSError, ValueError):
        pass  # no live queue job
    fh = open(AXON_CLIENT_LOCK, "a")
    deadline = time.time() + wait_s
    while True:
        try:
            fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return fh  # held (and released) with the process
        except OSError:
            if time.time() > deadline:
                log("bench: axon client lock still busy; proceeding anyway")
                return fh
            log("bench: waiting for axon client lock...")
            time.sleep(15)


def main():
    # Outage fallback: if the axon backend is unreachable, re-exec on the
    # host CPU with a reduced workload instead of hanging/failing — the
    # emitted JSON then carries platform/outage disclosure fields. An
    # explicitly requested non-axon platform is honored as-is.
    if ("axon" in os.environ.get("JAX_PLATFORMS", "axon")
            and os.environ.get("BENCH_CPU_FALLBACK") != "1"):
        # Lock FIRST (preempting any queue job), probe SECOND: probing while
        # another client legitimately holds the lock mis-reads "lock busy"
        # as "backend down" (the round-5 bench_r5 CPU-fallback bug). With
        # the lock held — acquired here or inherited from the supervisor's
        # job wrapper — the probe subprocess is the tunnel's single client.
        if _inherited_lock_fd() is None:
            globals()["_LOCK_FH"] = _acquire_axon_client_lock()
        if _backend_reachable(have_lock=True):
            pass
        else:
            log("bench: axon backend unreachable; falling back to CPU "
                "(reduced workload, disclosed in the JSON)")
            env = dict(os.environ, JAX_PLATFORMS="cpu",
                       PALLAS_AXON_POOL_IPS="", BENCH_CPU_FALLBACK="1")
            env.setdefault("BENCH_Q", "128")
            env.setdefault("BENCH_CHUNK", "128")
            env.setdefault("BENCH_REPS", "2")
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)], env)
    workload = make_workload()
    res = run_device(*workload)
    # headline = fastest path whose METRICS agree with the f32 factored
    # reference path (quality-safe). Exact per-rank equality is not
    # required: near-tied cosine scores shuffle under dtype/assoc changes;
    # the deliverable metrics are Hits@k/MRR. Additionally, a path must
    # pass the TRAINED-embedding certificate when one exists (|d_hits10|,
    # |d_hits5|, |d_mrr| < 5e-3 on the learnability fixture).
    cert = load_trained_cert()

    def cert_ok(key):
        if key.startswith("f32"):
            # f32_factored IS the reference; the f32 rel/head-shared paths
            # are algebraic restructures with ranks proven equal to it
            # (tests/test_eval.py), so they need no trained certificate.
            return True
        if cert is None:
            # No trained-embedding certificate on disk: bf16 paths are NOT
            # headline-eligible (the random-workload metric gate alone is
            # weak evidence — see load_trained_cert).
            return False
        c = cert.get("paths", {}).get(key)
        if c is None:
            return False
        # the deltas must be PRESENT and small — a truncated/foreign cert
        # entry with missing d_* keys is not evidence of fidelity
        return all(f"d_{m}" in c and abs(c[f"d_{m}"]) < 5e-3
                   for m in ("hits10", "hits5", "mrr"))

    ref = res["f32_factored"]
    candidates = []
    for key in ("bf16_rel_shared", "f32_rel_shared", "bf16_head_shared",
                "f32_head_shared", "bf16_factored", "f32_factored"):
        r = res[key]
        if (abs(r["hits10"] - ref["hits10"]) < 2e-3
                and abs(r["hits5"] - ref["hits5"]) < 2e-3
                and abs(r["mrr"] - ref["mrr"]) < 2e-3
                and cert_ok(key)):
            candidates.append((r["triples_per_sec"], key))
    tput, head_key = max(candidates)
    head = res[head_key]
    log(f"headline path: {head_key} at {tput:,.0f} triples/sec")
    try:
        baseline = run_torch_baseline(*workload)
        log(f"torch-cpu reference throughput: {baseline:,.0f} triples/sec")
        vs = tput / baseline
    except Exception as e:  # torch unavailable → report raw throughput
        log(f"baseline failed: {e}")
        baseline, vs = None, float("nan")
    import jax
    print(json.dumps({
        "metric": "zsl_candidate_ranking_throughput",
        "value": round(tput, 1),
        "unit": "triples/sec",
        "vs_baseline": round(vs, 2) if vs == vs else None,
        "path": head_key,
        "platform": jax.default_backend(),
        # set when the axon backend was unreachable and the bench re-execed
        # itself on the host CPU with a reduced workload: the value is then
        # NOT a TPU number (MFU fields are vs the v5e peak and meaningless)
        "backend_outage_cpu_fallback":
            os.environ.get("BENCH_CPU_FALLBACK") == "1",
        "bench_q": Q_DEVICE, "bench_reps": REPS,
        "achieved_tflops": round(head["achieved_tflops"], 2),
        "mfu": round(head["mfu"], 4),
        "flops_per_triple": PATH_FLOPS[head_key.split("_", 1)[1]],
        "peak_tflops_assumed": PEAK_TFLOPS[
            "bfloat16" if head_key.startswith("bf16") else "float32"],
        "in_program_reps": REPS,
        "rank_match_vs_f32_factored": head.get("rank_match_vs_f32_factored", 1.0),
        "hits10": round(head["hits10"], 4),
        "mrr": round(head["mrr"], 4),
        # disclosure fields
        "value_single_dispatch": round(head["triples_per_sec_single_dispatch"], 1),
        "value_unoverlapped_transfers": round(res["e2e_unoverlapped_tps"], 1),
        "value_overlapped_transfers": round(res["e2e_overlapped_tps"], 1),
        "overlap_slabs": res["overlap_slabs"],
        "overlapped_by_slabs": res["e2e_overlapped_by_slabs"],
        "trained_cert": (None if cert is None else {
            k: {m: cert["paths"][k].get(m) for m in
                ("d_hits10", "d_hits5", "d_mrr",
                 "rank_match_vs_f32_factored")}
            for k in cert.get("paths", {}) if k != "f32_factored"}),
        "hits10_f32_factored": round(ref["hits10"], 4),
        "mrr_f32_factored": round(ref["mrr"], 4),
        "f32_factored_tps": round(res["f32_factored"]["triples_per_sec"], 1),
        "bf16_head_shared_tps": round(res["bf16_head_shared"]["triples_per_sec"], 1),
        "bf16_rel_shared_tps": round(res["bf16_rel_shared"]["triples_per_sec"], 1),
        "baseline_triples_per_sec": round(baseline, 1) if baseline else None,
        "baseline_queries": Q_BASELINE,
    }))


if __name__ == "__main__":
    main()
