// ampis_tpu native RLE codec.
//
// Implements a COCO-bit-compatible run-length-encoding codec for binary
// segmentation masks, replacing the pycocotools C extension that the
// reference framework (rccohn/AMPIS) depends on at e.g.
// ampis/structures.py:12, ampis/analyze.py:11, ampis/applications/powder.py:17.
//
// Format (must match COCO exactly, since the on-disk pickles and JSON files
// produced by the reference use it):
//   * masks are encoded column-major (Fortran order);
//   * counts alternate runs of 0s and 1s, always starting with the 0-run
//     (possibly of length 0);
//   * the compressed string stores each count LEB128-style, 5 data bits per
//     byte, chars offset by 48, with counts[i] delta-encoded against
//     counts[i-2] for i > 2.
//
// All batched entry points are multithreaded (std::thread) and expose a
// plain C ABI consumed from Python via ctypes.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

typedef uint8_t byte;
typedef uint32_t uint;
typedef uint64_t u64;
typedef int64_t i64;

namespace {

inline uint umin(uint a, uint b) { return a < b ? a : b; }
inline uint umax(uint a, uint b) { return a > b ? a : b; }

// Run fn(i) for i in [0, n) across up to max_threads threads.
template <typename F>
void parallel_for(u64 n, int nthreads, F fn) {
  if (nthreads <= 1 || n <= 1) {
    for (u64 i = 0; i < n; ++i) fn(i);
    return;
  }
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int t = std::min<u64>(std::min<int>(nthreads, (int)hw), n);
  std::atomic<u64> next(0);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int k = 0; k < t; ++k) {
    threads.emplace_back([&]() {
      for (;;) {
        u64 i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : threads) th.join();
}

// Encode one column-major mask (h*w bytes) into alternating run counts.
// Returns number of counts written; out must hold h*w+1 entries.
u64 encode_one(const byte* m, u64 area, uint* out) {
  u64 k = 0;
  byte p = 0;
  uint c = 0;
  for (u64 j = 0; j < area; ++j) {
    byte v = m[j] ? 1 : 0;
    if (v != p) {
      out[k++] = c;
      c = 0;
      p = v;
    }
    ++c;
  }
  out[k++] = c;
  return k;
}

// Writes every pixel in [0, area) (so callers need not pre-zero the buffer).
// Plain loops instead of memset: short-run memset calls are pathologically
// slow on some virtualized hosts, and the compiler vectorizes these fine.
void decode_one(const uint* cnts, u64 m, byte* out, u64 area) {
  byte v = 0;
  u64 pos = 0;
  for (u64 j = 0; j < m && pos < area; ++j) {
    u64 c = cnts[j];
    if (pos + c > area) c = area - pos;
    byte* p = out + pos;
    for (u64 k = 0; k < c; ++k) p[k] = v;
    pos += c;
    v = !v;
  }
  for (; pos < area; ++pos) out[pos] = 0;
}

u64 area_one(const uint* cnts, u64 m) {
  u64 a = 0;
  for (u64 j = 1; j < m; j += 2) a += cnts[j];
  return a;
}

// COCO bbox convention: [x, y, w, h] from a column-major RLE.
void bbox_one(const uint* cnts, u64 m_in, u64 h, u64 /*w*/, double* bb) {
  u64 m = (m_in / 2) * 2;
  if (m == 0 || h == 0) {
    bb[0] = bb[1] = bb[2] = bb[3] = 0;
    return;
  }
  uint xs = (uint)-1, xe = 0, ys = (uint)-1, ye = 0, xp = 0;
  u64 cc = 0;
  bool any = false;
  for (u64 j = 0; j < m; ++j) {
    cc += cnts[j];
    u64 t = cc - (j % 2);  // last pixel of this run (for odd j: 1-run end)
    uint y = (uint)(t % h);
    uint x = (uint)((t - y) / h);
    if (j % 2 == 0) {
      xp = x;
    } else {
      any = true;
      if (xp < x) {  // 1-run spans multiple columns: covers full rows
        ys = 0;
        ye = (uint)(h - 1);
      }
      xs = umin(xs, xp);
      xe = umax(xe, x);
      ys = umin(ys, y);
      ye = umax(ye, y);
      // start pixel of the 1-run
      u64 s = cc - cnts[j];
      uint y0 = (uint)(s % h);
      ys = umin(ys, y0);
    }
  }
  if (!any) {
    bb[0] = bb[1] = bb[2] = bb[3] = 0;
    return;
  }
  bb[0] = xs;
  bb[2] = xe - xs + 1;
  bb[1] = ys;
  bb[3] = ye - ys + 1;
}

// Merge two run-lists with AND/OR. out must hold ma+mb entries.
u64 merge_pair(const uint* ca_in, u64 ma, const uint* cb_in, u64 mb,
               int intersect, uint* out) {
  if (ma == 0) {
    memcpy(out, cb_in, mb * sizeof(uint));
    return mb;
  }
  if (mb == 0) {
    memcpy(out, ca_in, ma * sizeof(uint));
    return ma;
  }
  uint ca = ca_in[0], cb = cb_in[0];
  u64 a = 1, b = 1, m = 0;
  int v = 0, va = 0, vb = 0, vp;
  u64 cc = 0, ct = 1;
  while (ct > 0) {
    uint c = umin(ca, cb);
    cc += c;
    ct = 0;
    ca -= c;
    if (!ca && a < ma) {
      ca = ca_in[a++];
      va = !va;
    }
    ct += ca;
    cb -= c;
    if (!cb && b < mb) {
      cb = cb_in[b++];
      vb = !vb;
    }
    ct += cb;
    vp = v;
    v = intersect ? (va && vb) : (va || vb);
    if (v != vp || ct == 0) {
      out[m++] = (uint)cc;
      cc = 0;
    }
  }
  return m;
}

// Intersection area of two run-lists without materializing the merge.
u64 intersect_area_pair(const uint* ca_in, u64 ma, const uint* cb_in, u64 mb) {
  if (ma == 0 || mb == 0) return 0;
  uint ca = ca_in[0], cb = cb_in[0];
  u64 a = 1, b = 1;
  int va = 0, vb = 0;
  u64 inter = 0, ct = 1;
  while (ct > 0) {
    uint c = umin(ca, cb);
    if (va && vb) inter += c;
    ct = 0;
    ca -= c;
    if (!ca && a < ma) {
      ca = ca_in[a++];
      va = !va;
    }
    ct += ca;
    cb -= c;
    if (!cb && b < mb) {
      cb = cb_in[b++];
      vb = !vb;
    }
    ct += cb;
  }
  return inter;
}

// bbox iou prefilter (COCO semantics, bb = [x,y,w,h]).
double bb_iou_pair(const double* d, const double* g, int crowd) {
  double da = d[2] * d[3], ga = g[2] * g[3];
  double w = std::min(d[2] + d[0], g[2] + g[0]) - std::max(d[0], g[0]);
  if (w <= 0) return 0;
  double h = std::min(d[3] + d[1], g[3] + g[1]) - std::max(d[1], g[1]);
  if (h <= 0) return 0;
  double i = w * h;
  double u = crowd ? da : da + ga - i;
  return i / u;
}

}  // namespace

extern "C" {

void rle_buf_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Compressed string <-> counts
// ---------------------------------------------------------------------------

// Decode a COCO-compressed counts string into uint32 counts.
// out must hold at least slen entries (each count uses >= 1 char).
// Returns the number of counts.
u64 rle_from_string(const char* s, u64 slen, uint* out) {
  u64 m = 0, p = 0;
  while (p < slen) {
    i64 x = 0;
    int k = 0, more = 1;
    while (more) {
      if (p >= slen) return m;  // malformed; bail out
      signed char c = (signed char)(s[p] - 48);
      x |= (i64)(c & 0x1f) << (5 * k);
      more = c & 0x20;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= (i64)(-1) << (5 * k);
    }
    if (m > 2) x += (i64)out[m - 2];
    out[m++] = (uint)x;
  }
  return m;
}

// Encode counts into the COCO-compressed string. out must hold m*6 chars.
// Returns string length.
u64 rle_to_string(const uint* cnts, u64 m, char* out) {
  u64 p = 0;
  for (u64 i = 0; i < m; ++i) {
    i64 x = (i64)cnts[i];
    if (i > 2) x -= (i64)cnts[i - 2];
    int more = 1;
    while (more) {
      char c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? x != -1 : x != 0;
      if (more) c |= 0x20;
      c += 48;
      out[p++] = c;
    }
  }
  return p;
}

// ---------------------------------------------------------------------------
// Encode / decode / area / bbox
// ---------------------------------------------------------------------------

// Encode n column-major masks, each h*w bytes, contiguous.
// Returns a malloc'd buffer of concatenated counts; fills ms[i] (counts per
// mask) and offs[i] (starting offset of mask i within the returned buffer).
uint* rle_encode_batch(const byte* masks, u64 h, u64 w, u64 n, u64* ms,
                       u64* offs, int nthreads) {
  u64 area = h * w;
  // Two passes: first compute per-mask run counts into thread-local buffers
  // sized h*w+1 would be n*(area+1) memory; instead encode into per-mask
  // malloc'd temporaries, then concatenate.
  std::vector<uint*> tmp(n, nullptr);
  parallel_for(n, nthreads, [&](u64 i) {
    uint* buf = (uint*)malloc((area + 1) * sizeof(uint));
    u64 m = encode_one(masks + i * area, area, buf);
    ms[i] = m;
    tmp[i] = (uint*)realloc(buf, std::max<u64>(m, 1) * sizeof(uint));
  });
  u64 total = 0;
  for (u64 i = 0; i < n; ++i) {
    offs[i] = total;
    total += ms[i];
  }
  uint* out = (uint*)malloc(std::max<u64>(total, 1) * sizeof(uint));
  parallel_for(n, nthreads, [&](u64 i) {
    memcpy(out + offs[i], tmp[i], ms[i] * sizeof(uint));
    free(tmp[i]);
  });
  return out;
}

// Decode n RLEs (concatenated counts + offsets) into column-major masks.
void rle_decode_batch(const uint* cnts, const u64* offs, const u64* ms, u64 n,
                      u64 h, u64 w, byte* out, int nthreads) {
  u64 area = h * w;
  parallel_for(n, nthreads, [&](u64 i) {
    decode_one(cnts + offs[i], ms[i], out + i * area, area);
  });
}

void rle_area_batch(const uint* cnts, const u64* offs, const u64* ms, u64 n,
                    u64* out, int nthreads) {
  parallel_for(n, nthreads,
               [&](u64 i) { out[i] = area_one(cnts + offs[i], ms[i]); });
}

void rle_to_bbox_batch(const uint* cnts, const u64* offs, const u64* ms, u64 n,
                       u64 h, u64 w, double* out, int nthreads) {
  parallel_for(n, nthreads, [&](u64 i) {
    bbox_one(cnts + offs[i], ms[i], h, w, out + 4 * i);
  });
}

// ---------------------------------------------------------------------------
// Merge
// ---------------------------------------------------------------------------

// Merge n RLEs (fold left) with AND/OR. Returns malloc'd counts, sets *m_out.
uint* rle_merge_many(const uint* cnts, const u64* offs, const u64* ms, u64 n,
                     int intersect, u64* m_out) {
  if (n == 0) {
    *m_out = 0;
    return (uint*)malloc(sizeof(uint));
  }
  u64 m = ms[0];
  uint* acc = (uint*)malloc(std::max<u64>(m, 1) * sizeof(uint));
  memcpy(acc, cnts + offs[0], m * sizeof(uint));
  for (u64 i = 1; i < n; ++i) {
    u64 cap = m + ms[i];
    uint* out = (uint*)malloc(std::max<u64>(cap, 1) * sizeof(uint));
    m = merge_pair(acc, m, cnts + offs[i], ms[i], intersect, out);
    free(acc);
    acc = out;
  }
  *m_out = m;
  return acc;
}

// area(merge(query, other_i, intersect=True)) for each i, divided by nothing
// (caller normalizes). Used by the powder satellite matcher hot loop
// (reference: ampis/applications/powder.py:82-83).
void rle_intersect_area_batch(const uint* q_cnts, u64 q_m, const uint* cnts,
                              const u64* offs, const u64* ms, u64 n, u64* out,
                              int nthreads) {
  parallel_for(n, nthreads, [&](u64 i) {
    out[i] = intersect_area_pair(q_cnts, q_m, cnts + offs[i], ms[i]);
  });
}

// ---------------------------------------------------------------------------
// IoU
// ---------------------------------------------------------------------------

// Pairwise mask IoU between ndt "detection" RLEs and ngt "ground truth" RLEs.
// Output is row-major (ndt, ngt) -- out[d*ngt+g] -- matching
// pycocotools.mask.iou(dt, gt, iscrowd) semantics, including the crowd rule
// (iou = I / area(dt) when iscrowd[g]).
// No 80x80 batching limit (the reference tiled calls at analyze.py:54-112 to
// work around it; tiled and untiled paths produce identical values here).
void rle_iou_batch(const uint* dt_cnts, const u64* dt_offs, const u64* dt_ms,
                   u64 ndt, const uint* gt_cnts, const u64* gt_offs,
                   const u64* gt_ms, u64 ngt, u64 h, u64 w,
                   const byte* iscrowd, double* out, int nthreads) {
  // bbox prefilter
  std::vector<double> db(4 * ndt), gb(4 * ngt);
  parallel_for(ndt, nthreads, [&](u64 d) {
    bbox_one(dt_cnts + dt_offs[d], dt_ms[d], h, w, &db[4 * d]);
  });
  parallel_for(ngt, nthreads, [&](u64 g) {
    bbox_one(gt_cnts + gt_offs[g], gt_ms[g], h, w, &gb[4 * g]);
  });
  parallel_for(ndt, nthreads, [&](u64 d) {
    for (u64 g = 0; g < ngt; ++g) {
      int crowd = iscrowd != nullptr && iscrowd[g];
      double o = bb_iou_pair(&db[4 * d], &gb[4 * g], crowd);
      if (o > 0) {
        u64 inter = intersect_area_pair(dt_cnts + dt_offs[d], dt_ms[d],
                                        gt_cnts + gt_offs[g], gt_ms[g]);
        double u;
        if (inter == 0) {
          u = 1;
          o = 0;
        } else if (crowd) {
          u = (double)area_one(dt_cnts + dt_offs[d], dt_ms[d]);
        } else {
          u = (double)(area_one(dt_cnts + dt_offs[d], dt_ms[d]) +
                       area_one(gt_cnts + gt_offs[g], gt_ms[g]) - inter);
        }
        o = inter == 0 ? 0 : (double)inter / u;
      }
      out[d * ngt + g] = o;
    }
  });
}

// ---------------------------------------------------------------------------
// Polygon -> RLE (COCO rleFrPoly semantics)
// ---------------------------------------------------------------------------

// Rasterize a polygon given as k (x, y) vertex pairs into an RLE over an
// h x w canvas, bit-identical to COCO's boundary-crossing algorithm.
// Returns malloc'd counts; sets *m_out.
uint* rle_fr_poly(const double* xy, u64 k, u64 h, u64 w, u64* m_out) {
  const double scale = 5.0;
  std::vector<int> x(k + 1), y(k + 1);
  for (u64 j = 0; j < k; ++j) x[j] = (int)(scale * xy[j * 2 + 0] + .5);
  x[k] = x[0];
  for (u64 j = 0; j < k; ++j) y[j] = (int)(scale * xy[j * 2 + 1] + .5);
  y[k] = y[0];
  // dense boundary points along each upsampled edge
  u64 m = 0;
  for (u64 j = 0; j < k; ++j)
    m += std::max(abs(x[j] - x[j + 1]), abs(y[j] - y[j + 1])) + 1;
  std::vector<int> u(m), v(m);
  m = 0;
  for (u64 j = 0; j < k; ++j) {
    int xs = x[j], xe = x[j + 1], ys = y[j], ye = y[j + 1];
    int dx = abs(xe - xs), dy = abs(ys - ye);
    int flip = (dx >= dy && xs > xe) || (dx < dy && ys > ye);
    if (flip) {
      std::swap(xs, xe);
      std::swap(ys, ye);
    }
    double s = dx >= dy ? (double)(ye - ys) / dx : (double)(xe - xs) / dy;
    if (dx >= dy) {
      for (int d = 0; d <= dx; ++d) {
        int t = flip ? dx - d : d;
        u[m] = t + xs;
        v[m] = (int)(ys + s * t + .5);
        ++m;
      }
    } else {
      for (int d = 0; d <= dy; ++d) {
        int t = flip ? dy - d : d;
        v[m] = t + ys;
        u[m] = (int)(xs + s * t + .5);
        ++m;
      }
    }
  }
  // keep x-crossings, downsample to pixel grid
  u64 kk = m;
  std::vector<int> xd_list, yd_list;
  xd_list.reserve(kk);
  yd_list.reserve(kk);
  for (u64 j = 1; j < kk; ++j) {
    if (u[j] != u[j - 1]) {
      double xd = (double)(u[j] < u[j - 1] ? u[j] : u[j] - 1);
      xd = (xd + .5) / scale - .5;
      if (floor(xd) != xd || xd < 0 || xd > (double)(w - 1)) continue;
      double yd = (double)(v[j] < v[j - 1] ? v[j] : v[j - 1]);
      yd = (yd + .5) / scale - .5;
      if (yd < 0)
        yd = 0;
      else if (yd > (double)h)
        yd = (double)h;
      yd = ceil(yd);
      xd_list.push_back((int)xd);
      yd_list.push_back((int)yd);
    }
  }
  // convert boundary crossings to run-length counts via sorted positions
  u64 nk = xd_list.size();
  std::vector<uint> a(nk + 1);
  for (u64 j = 0; j < nk; ++j)
    a[j] = (uint)(xd_list[j] * (int)h + yd_list[j]);
  a[nk] = (uint)(h * w);
  std::sort(a.begin(), a.end());
  uint p = 0;
  for (u64 j = 0; j <= nk; ++j) {
    uint t = a[j];
    a[j] -= p;
    p = t;
  }
  std::vector<uint> b;
  b.reserve(nk + 2);
  u64 j = 0;
  b.push_back(a[j++]);
  while (j <= nk) {
    if (a[j] > 0) {
      b.push_back(a[j++]);
    } else {
      ++j;
      if (j <= nk) b.back() += a[j++];
    }
  }
  uint* out = (uint*)malloc(std::max<u64>(b.size(), 1) * sizeof(uint));
  memcpy(out, b.data(), b.size() * sizeof(uint));
  *m_out = b.size();
  return out;
}

// ---------------------------------------------------------------------------
// Connected components (8-connectivity), replacing skimage.measure.label at
// reference data_utils.py:413. Returns number of labels; out gets labels
// 1..n_labels in first-encounter (raster) order, 0 = background.
// ---------------------------------------------------------------------------
int64_t cc_label(const byte* img, u64 h, u64 w, int32_t* out) {
  std::vector<int32_t> parent;
  parent.reserve(1024);
  parent.push_back(0);  // background sentinel

  auto find = [&](int32_t a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];
      a = parent[a];
    }
    return a;
  };
  auto unite = [&](int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b)
      parent[b] = a;
    else
      parent[a] = b;
  };

  // first pass (row-major scan; 8-connectivity: W, NW, N, NE neighbors)
  for (u64 r = 0; r < h; ++r) {
    for (u64 c = 0; c < w; ++c) {
      u64 idx = r * w + c;
      if (!img[idx]) {
        out[idx] = 0;
        continue;
      }
      int32_t lab = 0;
      int32_t neigh[4] = {0, 0, 0, 0};
      if (c > 0) neigh[0] = out[idx - 1];
      if (r > 0) {
        if (c > 0) neigh[1] = out[idx - w - 1];
        neigh[2] = out[idx - w];
        if (c + 1 < w) neigh[3] = out[idx - w + 1];
      }
      for (int q = 0; q < 4; ++q)
        if (neigh[q]) lab = lab ? std::min(lab, neigh[q]) : neigh[q];
      if (!lab) {
        lab = (int32_t)parent.size();
        parent.push_back(lab);
      } else {
        for (int q = 0; q < 4; ++q)
          if (neigh[q]) unite(lab, neigh[q]);
      }
      out[idx] = lab;
    }
  }
  // relabel to consecutive 1..n in first-encounter order
  std::vector<int32_t> remap(parent.size(), 0);
  int32_t next = 0;
  for (u64 i = 0; i < h * w; ++i) {
    if (!out[i]) continue;
    int32_t root = find(out[i]);
    if (!remap[root]) remap[root] = ++next;
    out[i] = remap[root];
  }
  return next;
}

// ---------------------------------------------------------------------------
// Mask paste + RLE encode fused on host.
//
// Takes the model's (n, mh, mw) float32 soft masks and n boxes in XYXY image
// coordinates, bilinearly resizes each mask into its box on an h x w canvas
// (zero padding outside, matching torch grid_sample(align_corners=False) as
// used by detectron2's paste_masks_in_image), thresholds at `thresh`, and
// RLE-encodes the result column-major -- without ever materializing the
// n x h x w bitmask stack (the reference materializes it on GPU and then
// compresses per-instance at data_utils.py:275).
// Returns malloc'd concatenated counts; fills ms/offs.
// ---------------------------------------------------------------------------
uint* paste_masks_encode(const float* masks, const float* boxes, u64 n, u64 mh,
                         u64 mw, u64 h, u64 w, float thresh, u64* ms, u64* offs,
                         int nthreads) {
  std::vector<uint*> tmp(n, nullptr);
  parallel_for(n, nthreads, [&](u64 i) {
    const float* mk = masks + i * mh * mw;
    double x0 = boxes[i * 4 + 0], y0 = boxes[i * 4 + 1];
    double x1 = boxes[i * 4 + 2], y1 = boxes[i * 4 + 3];
    // integer region that can contain nonzero samples (detectron2 pads by 1)
    i64 cx0 = std::min<i64>(std::max<i64>((i64)floor(x0) - 1, 0), (i64)w);
    i64 cy0 = std::min<i64>(std::max<i64>((i64)floor(y0) - 1, 0), (i64)h);
    i64 cx1 = std::max<i64>(std::min<i64>((i64)ceil(x1) + 1, (i64)w), cx0);
    i64 cy1 = std::max<i64>(std::min<i64>((i64)ceil(y1) + 1, (i64)h), cy0);
    double bw = std::max(x1 - x0, 1e-9), bh = std::max(y1 - y0, 1e-9);

    // Column-major run scan with on-the-fly bilinear sampling.
    std::vector<uint> cnts;
    cnts.reserve(256);
    u64 run = 0;  // current run length
    byte cur = 0; // current run value (starts with 0-run)
    auto push = [&](byte v, u64 len) {
      if (len == 0) return;
      if (v == cur) {
        run += len;
      } else {
        cnts.push_back((uint)run);
        cur = v;
        run = len;
      }
    };
    // columns before the box are all zero
    push(0, (u64)cx0 * h);
    // precompute vertical sample coords for rows [cy0, cy1)
    i64 nrows = cy1 - cy0;
    std::vector<double> gy(nrows > 0 ? nrows : 0);
    std::vector<i64> iy0(nrows > 0 ? nrows : 0);
    std::vector<double> wy(nrows > 0 ? nrows : 0);
    for (i64 r = 0; r < nrows; ++r) {
      // normalized coord in [-1, 1] relative to box, then to mask grid
      double yn = ((cy0 + r + 0.5) - y0) / bh * 2.0 - 1.0;
      double fy = ((yn + 1.0) * (double)mh - 1.0) / 2.0;
      gy[r] = fy;
      i64 f0 = (i64)floor(fy);
      iy0[r] = f0;
      wy[r] = fy - (double)f0;
    }
    for (i64 cx = cx0; cx < cx1; ++cx) {
      double xn = ((cx + 0.5) - x0) / bw * 2.0 - 1.0;
      double fx = ((xn + 1.0) * (double)mw - 1.0) / 2.0;
      i64 ix0 = (i64)floor(fx);
      double wx = fx - (double)ix0;
      i64 ix1 = ix0 + 1;
      bool x0in = ix0 >= 0 && ix0 < (i64)mw;
      bool x1in = ix1 >= 0 && ix1 < (i64)mw;
      // zeros above the box in this column
      push(0, (u64)cy0);
      for (i64 r = 0; r < nrows; ++r) {
        i64 y0i = iy0[r], y1i = y0i + 1;
        bool y0in = y0i >= 0 && y0i < (i64)mh;
        bool y1in = y1i >= 0 && y1i < (i64)mh;
        double v00 = (y0in && x0in) ? mk[y0i * mw + ix0] : 0.0;
        double v01 = (y0in && x1in) ? mk[y0i * mw + ix1] : 0.0;
        double v10 = (y1in && x0in) ? mk[y1i * mw + ix0] : 0.0;
        double v11 = (y1in && x1in) ? mk[y1i * mw + ix1] : 0.0;
        double vy = wy[r];
        double val = v00 * (1 - vy) * (1 - wx) + v01 * (1 - vy) * wx +
                     v10 * vy * (1 - wx) + v11 * vy * wx;
        push(val > thresh ? 1 : 0, 1);
      }
      // zeros below the box in this column
      push(0, (u64)(h - cy1));
    }
    // columns after the box
    push(0, (u64)(w - cx1) * h);
    cnts.push_back((uint)run);
    ms[i] = cnts.size();
    uint* buf = (uint*)malloc(cnts.size() * sizeof(uint));
    memcpy(buf, cnts.data(), cnts.size() * sizeof(uint));
    tmp[i] = buf;
  });
  u64 total = 0;
  for (u64 i = 0; i < n; ++i) {
    offs[i] = total;
    total += ms[i];
  }
  uint* out = (uint*)malloc(std::max<u64>(total, 1) * sizeof(uint));
  parallel_for(n, nthreads, [&](u64 i) {
    memcpy(out + offs[i], tmp[i], ms[i] * sizeof(uint));
    free(tmp[i]);
  });
  return out;
}

}  // extern "C"
