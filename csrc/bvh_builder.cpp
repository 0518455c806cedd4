// Native BVH builder: binary BVH, largest-extent median split, DFS layout
// with skip links.  Mirrors sienerf_tpu/geom/bvh.py::_build_bvh_numpy (which
// is the fallback); this is the performance tier for large meshes — the
// reference builds its 4-ary BVH in C++ too (triangle_bvh.cu:425-505).
//
// C ABI (ctypes):
//   int bvh_build(const float* tris, long n_tris, int leaf_size,
//                 float* bbox_min, float* bbox_max, int* first_tri,
//                 int* tri_count, int* skip, int* perm, long* n_nodes_out);
// Caller allocates outputs for the worst case 2*ceil(n/leaf)-ish nodes
// (use 4*n_tris/leaf_size + 16 to be safe; actual count returned).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BuildEntry {
    int64_t lo, hi;    // range in perm[]
    int64_t parent_slot;  // node index whose subtree size we patch, -1 root
};

}  // namespace

extern "C" int bvh_build(
    const float* tris,      // (n_tris, 3, 3) row-major
    int64_t n_tris,
    int leaf_size,
    float* out_bbox_min,    // (max_nodes, 3)
    float* out_bbox_max,
    int32_t* out_first_tri,
    int32_t* out_tri_count,
    int32_t* out_skip,
    int32_t* out_perm,      // (n_tris,)
    int64_t max_nodes,
    int64_t* n_nodes_out
) {
    if (n_tris <= 0 || leaf_size <= 0) return 1;

    std::vector<float> cmin(n_tris * 3), cmax(n_tris * 3), cent(n_tris * 3);
    for (int64_t i = 0; i < n_tris; i++) {
        const float* t = tris + i * 9;
        for (int d = 0; d < 3; d++) {
            float a = t[d], b = t[3 + d], c = t[6 + d];
            float lo = std::min(a, std::min(b, c));
            float hi = std::max(a, std::max(b, c));
            cmin[i * 3 + d] = lo;
            cmax[i * 3 + d] = hi;
            cent[i * 3 + d] = (lo + hi) * 0.5f;
        }
    }

    std::vector<int64_t> perm(n_tris);
    for (int64_t i = 0; i < n_tris; i++) perm[i] = i;

    std::vector<int64_t> subtree_size;  // per node, patched post-order
    int64_t n_nodes = 0;
    int64_t out_tri_cursor = 0;

    // iterative DFS: emit node, then push right & left so left is processed
    // next (DFS pre-order = node order)
    struct Frame { int64_t lo, hi, my_idx; int state; };
    std::vector<Frame> stack;
    stack.push_back({0, n_tris, -1, 0});

    // we need subtree sizes for skip links: record (node, end_node) after
    // the full DFS by tracking ranges: node i's subtree = [i, i + size)
    std::vector<int64_t> node_end;  // exclusive end of each node's subtree

    // Because sizes are only known post-order, do the classic two-phase:
    // build with an explicit recursion stack that patches end indices.
    struct Task { int64_t lo, hi; int64_t node_idx; bool second_visit; };
    std::vector<Task> tasks;
    tasks.push_back({0, n_tris, -1, false});
    node_end.reserve(1 << 20);

    std::vector<Task> post;  // nodes awaiting subtree-end patch

    while (!tasks.empty()) {
        Task t = tasks.back();
        tasks.pop_back();
        if (t.second_visit) {
            node_end[t.node_idx] = n_nodes;
            continue;
        }
        if (n_nodes >= max_nodes) return 2;
        int64_t my = n_nodes++;
        node_end.push_back(-1);

        // bbox of range
        float lo3[3] = {1e30f, 1e30f, 1e30f}, hi3[3] = {-1e30f, -1e30f, -1e30f};
        for (int64_t i = t.lo; i < t.hi; i++) {
            int64_t tr = perm[i];
            for (int d = 0; d < 3; d++) {
                lo3[d] = std::min(lo3[d], cmin[tr * 3 + d]);
                hi3[d] = std::max(hi3[d], cmax[tr * 3 + d]);
            }
        }
        std::memcpy(out_bbox_min + my * 3, lo3, 12);
        std::memcpy(out_bbox_max + my * 3, hi3, 12);

        int64_t count = t.hi - t.lo;
        if (count <= leaf_size) {
            out_first_tri[my] = (int32_t)out_tri_cursor;
            out_tri_count[my] = (int32_t)count;
            for (int64_t i = t.lo; i < t.hi; i++) out_perm[out_tri_cursor++] = (int32_t)perm[i];
            node_end[my] = n_nodes;
            continue;
        }
        out_first_tri[my] = -1;
        out_tri_count[my] = 0;

        int axis = 0;
        float ext = hi3[0] - lo3[0];
        for (int d = 1; d < 3; d++) {
            float e = hi3[d] - lo3[d];
            if (e > ext) { ext = e; axis = d; }
        }
        int64_t mid = t.lo + count / 2;
        std::nth_element(
            perm.begin() + t.lo, perm.begin() + mid, perm.begin() + t.hi,
            [&](int64_t a, int64_t b) { return cent[a * 3 + axis] < cent[b * 3 + axis]; });

        // post-visit patch marker, then right, then left (LIFO -> left first)
        tasks.push_back({t.lo, t.hi, my, true});
        tasks.push_back({mid, t.hi, -1, false});
        tasks.push_back({t.lo, mid, -1, false});
    }

    for (int64_t i = 0; i < n_nodes; i++) {
        int64_t nxt = node_end[i];
        out_skip[i] = (nxt >= n_nodes) ? -1 : (int32_t)nxt;
    }
    *n_nodes_out = n_nodes;
    return 0;
}
