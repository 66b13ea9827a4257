"""Scan every QUERIES plan for Exchange SinglePartition nodes and print the
direct child of each — used to design/verify the test_plans guard that no
unbounded input flows through a single-partition exchange."""
import sys

sys.path.insert(0, "/root/repo")

from language_identification_spark.session import get_spark
from language_identification_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def main():
    spark = get_spark()
    bad = {}
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            continue
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" in ln:
                child = lines[i + 1].strip() if i + 1 < len(lines) else "<none>"
                bad.setdefault(name, []).append(child[:120])
    for name, children in bad.items():
        print(f"{name}:")
        for c in children:
            print(f"    {c}")
    print(f"\n{len(bad)} queries with SinglePartition exchanges")


if __name__ == "__main__":
    main()
