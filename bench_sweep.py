"""Within-session A/B sweep of bench.py configs on one TPU process.

Cross-session tunnel variance is up to ~25% (TUNING.md), so capacity /
frame-batch comparisons are only meaningful when run minutes apart in ONE
process — this driver runs each config's full chained bench sequentially
and prints one labeled JSON line per config.

Usage: python -u bench_sweep.py 'auto:1:scan' '1024:1:scan' 'auto:1:batch:8'
  (each arg is
  BAND_CAPACITY:FRAME_BATCH:RASTER_MODE[:BAND_ROWS[:FLOW_MODE[:WARP_MODE[
  :DEPTH_MODE[:PART_CONV[:BIN_IMPL[:RANGE_CHECKED[:CROP_COLS[:WARP_CROP[
  :FLOW_CROP[:TILE_COLS]]]]]]]]]]];
  capacity 'auto' = the measured per-clip bucket selection, the production
  default; BAND_ROWS defaults to 16, FLOW_MODE to scan, WARP_MODE to lut,
  DEPTH_MODE to fused, PART_CONV to blocks8; BIN_IMPL/RANGE_CHECKED/
  CROP_COLS default to whatever adapt_to_clip selects — pass sort/copysort,
  0/1, and a width (0 = full) to pin; WARP_CROP pins the texture-warp
  column window (0 = full width, default = the select_mask_crop_cols
  bucket); FLOW_CROP 0/1 gates the bc-transform + source-warp crop
  (default 1); TILE_COLS requests 2-D (row-band x column-tile) binning at
  that tile width via JAFPRO_RASTER_TILE_COLS (0/absent = 1-D banding;
  adapt_to_clip still validates the clip and falls back to 1-D if no
  per-tile bucket is exact)).
"""

import json
import os
import sys
import time

import bench


def main():
    configs = sys.argv[1:] or ["auto:1:scan", "auto:1:batch", "1024:1:scan"]
    results = {}
    for spec in configs:
        parts = spec.split(":")
        cap, fb, mode = parts[:3]
        rows = parts[3] if len(parts) > 3 else "16"
        flow = parts[4] if len(parts) > 4 else "scan"
        warp = parts[5] if len(parts) > 5 else "lut"
        depth = parts[6] if len(parts) > 6 else "fused"
        pconv = parts[7] if len(parts) > 7 else "blocks8"
        bin_impl = parts[8] if len(parts) > 8 else ""
        rangechk = parts[9] if len(parts) > 9 else ""
        crop = parts[10] if len(parts) > 10 else ""
        warp_crop = parts[11] if len(parts) > 11 else ""
        flow_crop = parts[12] if len(parts) > 12 else ""
        tile_cols = parts[13] if len(parts) > 13 else ""
        os.environ["BENCH_BAND_CAPACITY"] = cap
        os.environ["BENCH_FRAME_BATCH"] = fb
        os.environ["BENCH_RASTER_MODE"] = mode
        os.environ["BENCH_BAND_ROWS"] = rows
        os.environ["BENCH_FLOW_MODE"] = flow
        os.environ["BENCH_WARP_MODE"] = warp
        os.environ["BENCH_DEPTH_MODE"] = depth
        os.environ["BENCH_PART_CONV"] = pconv
        for key, val in (("BENCH_BIN_IMPL", bin_impl),
                         ("BENCH_RANGE_CHECKED", rangechk),
                         ("BENCH_CROP_COLS", crop),
                         ("BENCH_WARP_CROP", warp_crop),
                         ("BENCH_FLOW_CROP", flow_crop),
                         ("JAFPRO_RASTER_TILE_COLS", tile_cols)):
            if val:
                os.environ[key] = val
            else:
                os.environ.pop(key, None)
        print(f"=== config cap={cap} fb={fb} raster={mode} rows={rows} "
              f"flow={flow} warp={warp} depth={depth} pconv={pconv} "
              f"bin={bin_impl or 'adapt'} rangechk={rangechk or 'adapt'} "
              f"crop={crop or 'adapt'} warp_crop={warp_crop or 'adapt'} "
              f"flow_crop={flow_crop or '1'} tile_cols={tile_cols or '0'} ===",
              file=sys.stderr)
        t0 = time.time()
        bench.main()
        print(f"=== config {spec} done in {time.time() - t0:.0f}s ===",
              file=sys.stderr)
        results[spec] = True
    print(json.dumps({"sweep": configs}), file=sys.stderr)


if __name__ == "__main__":
    main()
