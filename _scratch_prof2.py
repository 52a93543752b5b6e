import glob, gzip, json, collections
f = sorted(glob.glob("/tmp/jaxtrace2/**/*.trace.json.gz", recursive=True))[-1]
ev = json.loads(gzip.open(f).read())["traceEvents"]
want = {"fusion.203", "fusion.208", "fusion.206", "fusion.199", "fusion.184",
        "fusion.204", "fusion.194", "fusion.197"}
seen = {}
for e in ev:
    if e.get("ph") == "X" and e.get("name") in want and e["name"] not in seen:
        seen[e["name"]] = e.get("args", {})
for k in sorted(seen):
    print(k, "->", {a: str(v)[:220] for a, v in seen[k].items()})
