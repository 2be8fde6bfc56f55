"""Round-6 measurement harness (bench.py is frozen; guide §1.4 noop-sink
isolation lives here). Usage:
  python bench_extra.py plans  q1 q2 ...   # dump .explain('formatted') to plans/r06/<q>_<tag>.txt
  python bench_extra.py time   q1 q2 ...   # noop-materialize each query N times, print seconds
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), PLAN_TAG (before/after), REPS (default 2).
"""
import os, sys, time, json

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
TAG = os.environ.get("PLAN_TAG", "before")
REPS = int(os.environ.get("REPS", "2"))

def main():
    mode, names = sys.argv[1], sys.argv[2:]
    from bench import make_spark, materialize, CPUS
    import __spark_entry__ as entry
    qs = entry.queries()
    spark = make_spark(CPUS)
    try:
        if mode == "plans":
            for n in names:
                df = qs[n](spark, SF_DIR)
                p = os.path.join(REPO, "plans", "r06", f"{n}_{TAG}.txt")
                with open(p, "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
                print("wrote", p)
        elif mode == "time":
            out = {}
            for n in names:
                ts = []
                for _ in range(REPS):
                    spark.sparkContext.setJobDescription(f"r06:{n}")
                    t0 = time.time()
                    materialize(qs[n](spark, SF_DIR))
                    ts.append(round(time.time() - t0, 3))
                out[n] = ts
                print(n, ts, flush=True)
            print(json.dumps(out))
    finally:
        spark.stop()

if __name__ == "__main__":
    main()
