import math, sys, time
import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import __spark_entry__ as em
from parquet_generator_spark.operators import cache
from _simtypes import oracle_type_problems, type_class_mismatches

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, bool): return str(int(v))
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

df = em.entry(spark)
rows = df.collect()
assert len(rows) > 0, "entry returned 0 rows"
print(f"entry: OK {len(rows)} rows, schema={df.columns}")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

Q, O = em.queries(), em.oracle_sql()
fails = []
for name in sorted(Q):
    t0 = time.time()
    try:
        sdf = Q[name](spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in O:
            print(f"{name}: rows-only OK ({len(srows)} rows, {time.time()-t0:.1f}s)")
            cache.release_all(spark)
            continue
        cur = con.execute(O[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        ok_v = ok_cols and ok_n and canon(srows, scols) == canon(drows, dcols)
        # typed-parity layer: the driver's hash is typed, the string
        # canon above is not (round-9 HUGEINT blind spot)
        tbad = oracle_type_problems(con, O[name])
        cbad = (type_class_mismatches(srows, scols, drows, dcols)
                if ok_cols else [])
        if tbad or cbad:
            fails.append(name)
            print(f"{name}: TYPE-FAIL duck_types={tbad} classes={cbad}")
        elif ok_v:
            print(f"{name}: MATCH ({len(srows)} rows, {time.time()-t0:.1f}s)")
        else:
            fails.append(name)
            print(f"{name}: MISMATCH cols_ok={ok_cols} n spark={len(srows)} duck={len(drows)}")
            if not ok_cols:
                print(f"  spark cols={sorted(scols)}\n  duck cols={sorted(dcols)}")
        cache.release_all(spark)
    except Exception as e:
        cache.release_all(spark)
        fails.append(name)
        print(f"{name}: ERROR {type(e).__name__}: {e}")
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
