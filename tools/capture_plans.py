"""Capture .explain('formatted') for named queries into plans/r06/.

Usage: python tools/capture_plans.py <suffix> <query> [query ...]
Writes plans/r06/<query>_<suffix>.txt
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from bench import make_session
    import __spark_entry__ as entrymod
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = make_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
