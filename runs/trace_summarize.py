import gzip, json, collections, glob, sys, re
path = sorted(glob.glob(sys.argv[1] + '/plugins/profile/*/*.trace.json.gz'))[-1]
with gzip.open(path) as f:
    data = json.load(f)
evs = data.get('traceEvents', [])
# find device pids: processes named like TPU / device
pidname = {}
for e in evs:
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
        pidname[e['pid']] = e['args'].get('name', '')
dev_pids = {p for p, n in pidname.items() if 'TPU' in n or 'tpu' in n or '/device' in n}
print("processes:", pidname)
agg = collections.Counter(); cnt = collections.Counter()
total = 0
for e in evs:
    if e.get('ph') == 'X' and 'dur' in e and e.get('pid') in dev_pids:
        name = e['name']
        agg[name] += e['dur']; cnt[name] += 1
        total += e['dur']
INNER = 32
print(f"total device time: {total/1e3:.2f} ms ({total/INNER:.0f} us/step)")
for name, dur in agg.most_common(40):
    print(f"{dur/INNER:8.1f} us/step  x{cnt[name]:4d}  {name[:80]}")
