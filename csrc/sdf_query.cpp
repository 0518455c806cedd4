// Native signed-distance queries against the flattened skip-link BVH
// (csrc/bvh_builder.cpp layout).  Host-side GT for SDF training: the
// closest-point DFS is pointer-chasing work that runs in microseconds per
// point on CPU but needs thousands of serialized while_loop iterations on
// TPU (each latency-bound) — a full training bundle on-device exceeds the
// TPU worker watchdog.  The reference computes these on GPU
// (triangle_bvh.cu:141-339 signed_distance_gpu); the TPU-native split is
// geometry on host threads, neural eval on chip.
//
// C ABI (ctypes):
//   int sdf_query(const float* tris, int64 n_tris,
//                 const float* bbox_min, const float* bbox_max,
//                 const int32* first_tri, const int32* tri_count,
//                 const int32* skip, int64 n_nodes,
//                 const float* points, int64 n_points,
//                 int mode,        // 0 = watertight (parity of one stab
//                                  //     ray), 1 = raystab (32 fibonacci
//                                  //     dirs, outside iff any escapes)
//                 int n_threads,
//                 float* out_sd);  // (n_points,)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct V3 {
    float x, y, z;
};

inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 add(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 mul(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

// Ericson, Real-Time Collision Detection 5.1.5 (same region logic as the
// jax implementation in geom/bvh.py::closest_on_tri)
float closest_dist2_on_tri(V3 p, V3 a, V3 b, V3 c) {
    V3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
    float d1 = dot(ab, ap), d2 = dot(ac, ap);
    if (d1 <= 0 && d2 <= 0) { V3 d = sub(p, a); return dot(d, d); }
    V3 bp = sub(p, b);
    float d3 = dot(ab, bp), d4 = dot(ac, bp);
    if (d3 >= 0 && d4 <= d3) { V3 d = sub(p, b); return dot(d, d); }
    float vc = d1 * d4 - d3 * d2;
    if (vc <= 0 && d1 >= 0 && d3 <= 0) {
        float v = d1 / (d1 - d3);
        V3 q = add(a, mul(ab, v));
        V3 d = sub(p, q);
        return dot(d, d);
    }
    V3 cp = sub(p, c);
    float d5 = dot(ab, cp), d6 = dot(ac, cp);
    if (d6 >= 0 && d5 <= d6) { V3 d = sub(p, c); return dot(d, d); }
    float vb = d5 * d2 - d1 * d6;
    if (vb <= 0 && d2 >= 0 && d6 <= 0) {
        float w = d2 / (d2 - d6);
        V3 q = add(a, mul(ac, w));
        V3 d = sub(p, q);
        return dot(d, d);
    }
    float va = d3 * d6 - d5 * d4;
    if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
        float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
        V3 q = add(b, mul(sub(c, b), w));
        V3 d = sub(p, q);
        return dot(d, d);
    }
    float denom = 1.0f / (va + vb + vc);
    float v = vb * denom, w = vc * denom;
    V3 q = add(a, add(mul(ab, v), mul(ac, w)));
    V3 d = sub(p, q);
    return dot(d, d);
}

inline float box_dist2(V3 p, const float* lo, const float* hi) {
    float dx = std::fmax(std::fmax(lo[0] - p.x, 0.0f), p.x - hi[0]);
    float dy = std::fmax(std::fmax(lo[1] - p.y, 0.0f), p.y - hi[1]);
    float dz = std::fmax(std::fmax(lo[2] - p.z, 0.0f), p.z - hi[2]);
    return dx * dx + dy * dy + dz * dz;
}

struct Ctx {
    const float* tris;
    const float* bmin;
    const float* bmax;
    const int32_t* first;
    const int32_t* count;
    const int32_t* skip;
    int64_t n_nodes;
};

float closest_dist(const Ctx& c, V3 p) {
    // nearest-child-first traversal with best-distance pruning (the
    // reference's sorted-children descent, triangle_bvh.cu:195-339).  In
    // the DFS skip-link layout an interior node's children are
    // left = node+1 and right = skip[left].
    float best = 3.4e38f;
    int32_t stack[96];
    float sdist[96];
    int sp = 0;
    stack[sp] = 0;
    sdist[sp++] = box_dist2(p, c.bmin, c.bmax);
    while (sp > 0) {
        sp--;
        if (sdist[sp] >= best) continue;
        int32_t node = stack[sp];
        int32_t cnt = c.count[node];
        if (cnt > 0) {
            int32_t f = c.first[node];
            for (int32_t i = 0; i < cnt; i++) {
                const float* t = c.tris + (int64_t)(f + i) * 9;
                float d2 = closest_dist2_on_tri(
                    p, {t[0], t[1], t[2]}, {t[3], t[4], t[5]}, {t[6], t[7], t[8]});
                if (d2 < best) best = d2;
            }
        } else {
            int32_t l = node + 1;
            int32_t r = c.skip[l];
            float dl = box_dist2(p, c.bmin + l * 3, c.bmax + l * 3);
            if (r >= 0 && r != c.skip[node]) {
                float dr = box_dist2(p, c.bmin + r * 3, c.bmax + r * 3);
                // push the farther child first so the closer pops first
                if (dl <= dr) {
                    if (dr < best && sp < 95) { stack[sp] = r; sdist[sp++] = dr; }
                    if (dl < best && sp < 95) { stack[sp] = l; sdist[sp++] = dl; }
                } else {
                    if (dl < best && sp < 95) { stack[sp] = l; sdist[sp++] = dl; }
                    if (dr < best && sp < 95) { stack[sp] = r; sdist[sp++] = dr; }
                }
            } else {
                if (dl < best && sp < 95) { stack[sp] = l; sdist[sp++] = dl; }
            }
        }
    }
    return std::sqrt(best);
}

inline bool ray_box(V3 o, V3 inv, const float* lo, const float* hi) {
    float t1 = (lo[0] - o.x) * inv.x, t2 = (hi[0] - o.x) * inv.x;
    float tmin = std::fmin(t1, t2), tmax = std::fmax(t1, t2);
    t1 = (lo[1] - o.y) * inv.y; t2 = (hi[1] - o.y) * inv.y;
    tmin = std::fmax(tmin, std::fmin(t1, t2));
    tmax = std::fmin(tmax, std::fmax(t1, t2));
    t1 = (lo[2] - o.z) * inv.z; t2 = (hi[2] - o.z) * inv.z;
    tmin = std::fmax(tmin, std::fmin(t1, t2));
    tmax = std::fmin(tmax, std::fmax(t1, t2));
    return tmax >= std::fmax(tmin, 0.0f);
}

// Moller-Trumbore; counts hits with t > 0 (parity), or reports any-hit.
int count_hits(const Ctx& c, V3 o, V3 d, bool any_hit) {
    V3 inv = {1.0f / (std::fabs(d.x) < 1e-12f ? (d.x < 0 ? -1e-12f : 1e-12f) : d.x),
              1.0f / (std::fabs(d.y) < 1e-12f ? (d.y < 0 ? -1e-12f : 1e-12f) : d.y),
              1.0f / (std::fabs(d.z) < 1e-12f ? (d.z < 0 ? -1e-12f : 1e-12f) : d.z)};
    int hits = 0;
    int32_t node = 0;
    while (node >= 0) {
        if (!ray_box(o, inv, c.bmin + node * 3, c.bmax + node * 3)) {
            node = c.skip[node];
            continue;
        }
        int32_t cnt = c.count[node];
        if (cnt > 0) {
            int32_t f = c.first[node];
            for (int32_t i = 0; i < cnt; i++) {
                const float* t = c.tris + (int64_t)(f + i) * 9;
                V3 a = {t[0], t[1], t[2]};
                V3 ab = sub({t[3], t[4], t[5]}, a);
                V3 ac = sub({t[6], t[7], t[8]}, a);
                V3 pv = cross(d, ac);
                float det = dot(ab, pv);
                if (std::fabs(det) < 1e-12f) continue;
                float idet = 1.0f / det;
                V3 tv = sub(o, a);
                float u = dot(tv, pv) * idet;
                if (u < 0.0f || u > 1.0f) continue;
                V3 qv = cross(tv, ab);
                float v = dot(d, qv) * idet;
                if (v < 0.0f || u + v > 1.0f) continue;
                float th = dot(ac, qv) * idet;
                if (th > 1e-6f) {
                    hits++;
                    if (any_hit) return hits;
                }
            }
            node = c.skip[node];
        } else {
            node = node + 1;
        }
    }
    return hits;
}

// same constants as geom/sdf_gt.py
const float WATERTIGHT_DIR[3] = {0.48362f, 0.62426f, 0.61292f};

void fibonacci_dirs(int n, std::vector<V3>& out) {
    // matches ops/samplers.py::fibonacci_sphere_dirs exactly
    out.resize(n);
    const double golden = M_PI * (1.0 + std::sqrt(5.0));
    for (int i = 0; i < n; i++) {
        double ii = i + 0.5;
        double phi = std::acos(1.0 - 2.0 * ii / n);
        double theta = golden * ii;
        out[i] = {(float)(std::cos(theta) * std::sin(phi)),
                  (float)(std::sin(theta) * std::sin(phi)),
                  (float)std::cos(phi)};
    }
}

}  // namespace

extern "C" int sdf_query(
    const float* tris, int64_t n_tris,
    const float* bbox_min, const float* bbox_max,
    const int32_t* first_tri, const int32_t* tri_count,
    const int32_t* skip, int64_t n_nodes,
    const float* points, int64_t n_points,
    int mode, int n_threads, float* out_sd
) {
    (void)n_tris;
    if (n_nodes <= 0 || n_points < 0) return 1;
    Ctx c{tris, bbox_min, bbox_max, first_tri, tri_count, skip, n_nodes};
    std::vector<V3> stab;
    if (mode == 1) fibonacci_dirs(32, stab);
    if (n_threads < 1) n_threads = 1;

    std::atomic<int64_t> cursor{0};
    const int64_t CHUNK = 512;
    auto worker = [&]() {
        for (;;) {
            int64_t lo = cursor.fetch_add(CHUNK);
            if (lo >= n_points) break;
            int64_t hi = std::min(lo + CHUNK, n_points);
            for (int64_t i = lo; i < hi; i++) {
                V3 p = {points[i * 3], points[i * 3 + 1], points[i * 3 + 2]};
                float d = closest_dist(c, p);
                bool inside;
                if (mode == 1) {
                    inside = true;
                    for (const V3& dir : stab) {
                        if (count_hits(c, p, dir, /*any_hit=*/true) == 0) {
                            inside = false;  // a stab ray escaped
                            break;
                        }
                    }
                } else {
                    inside = (count_hits(c, p, {WATERTIGHT_DIR[0], WATERTIGHT_DIR[1], WATERTIGHT_DIR[2]},
                                         /*any_hit=*/false) % 2) == 1;
                }
                out_sd[i] = inside ? -d : d;
            }
        }
    };
    std::vector<std::thread> pool;
    for (int t = 1; t < n_threads; t++) pool.emplace_back(worker);
    worker();
    for (auto& th : pool) th.join();
    return 0;
}
