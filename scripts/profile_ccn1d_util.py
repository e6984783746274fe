"""Shared xprof hlo_stats parsing (also used by profile_lggnn.py)."""

import glob
import json
import os


def parse_hlo_stats(trace_dir, top_n=15):
    """Top HLO ops by total device time from the xprof hlo_stats tool."""
    from xprof.convert import raw_to_tool_data as r2t

    sess = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*")))[-1]
    xplane = glob.glob(os.path.join(sess, "*.xplane.pb"))
    data, _ = r2t.xspace_to_tool_data(xplane, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tab = json.loads(data)
    cols = [c["id"] for c in tab["cols"]]
    rows = []
    for r in tab["rows"]:
        d = {c: (cell or {}).get("v") for c, cell in zip(cols, r["c"])}
        rows.append(d)
    rows.sort(key=lambda d: -(d.get("total_time") or 0.0))
    return rows[:top_n], rows
