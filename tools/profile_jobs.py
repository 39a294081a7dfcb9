import sys, time, json, urllib.request
sys.path.insert(0, "/root/repo")
from database_replicator_spark.session import build_session
from database_replicator_spark import queries as q
spark = build_session("profile_jobs", extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
gate = sys.argv[1] if len(sys.argv) > 1 else "corpus_dedup_cluster_hist"
fn = q.all_queries()[gate]
# warm
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
ui = spark.sparkContext.uiWebUrl
app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
before = {j["jobId"] for j in json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"))}
t0 = time.perf_counter()
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
print("wall:", round(time.perf_counter() - t0, 3))
time.sleep(1)
jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"))
new = [j for j in jobs if j["jobId"] not in before]
from datetime import datetime
def dur(j):
    f = "%Y-%m-%dT%H:%M:%S.%f%Z"
    t1 = datetime.strptime(j["submissionTime"].replace("GMT",""), "%Y-%m-%dT%H:%M:%S.%f")
    t2 = datetime.strptime(j["completionTime"].replace("GMT",""), "%Y-%m-%dT%H:%M:%S.%f")
    return (t2 - t1).total_seconds()
tot = 0
for j in sorted(new, key=lambda x: x["jobId"]):
    d = dur(j)
    tot += d
    print(f"  job {j['jobId']}: {d:6.3f}s  tasks={j['numTasks']:4d}  {j.get('name','')[:90]}")
print("sum of job durations:", round(tot, 2), "n_jobs:", len(new))
spark.stop()
