"""Spark-free saturation probe (BENCH/BASELINE.md evidence): N pinned single-core processes each run the
pipeline's Python kernel (doc_stats + NB detect) over the same docs; if
per-core throughput drops from 8 -> 32 processes, the box (memory subsystem /
SMT / thermal), not the engine, caps the 32-thread Spark leg."""
import sys, os, time, multiprocessing as mp

def worker(core, dur, q):
    os.sched_setaffinity(0, {core})
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb
    con = duckdb.connect()
    texts = [r[0] for r in con.execute("select text from read_parquet('/root/testdata/sf0.1/documents.parquet')").fetchall()]
    from language_identification_spark.fixtures import training_corpus
    from language_identification_spark.oracle.langid import NgramNBModel
    from language_identification_spark.oracle.quality import doc_stats
    m = NgramNBModel.train(training_corpus())
    m.detect_batch(texts[:64])  # warm dense cache
    t_end = time.time() + dur
    n = 0
    while time.time() < t_end:
        batch = texts[n % 4000 : n % 4000 + 512]
        m.detect_batch(batch)
        for t in batch:
            doc_stats(t)
        n += len(batch)
    q.put(n / dur)

def run(ncores, dur=12):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(c, dur, q)) for c in range(ncores)]
    for p in ps: p.start()
    rates = [q.get() for _ in ps]
    for p in ps: p.join()
    total = sum(rates)
    return total, total / ncores

if __name__ == '__main__':
    for n in (8, 32):
        tot, per = run(n)
        print(f"{n} procs: {tot:.0f} docs/s total, {per:.0f}/core")
        time.sleep(3)
