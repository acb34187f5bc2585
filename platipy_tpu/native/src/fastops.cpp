// Native host-side fast paths for platipy_tpu.
//
// The reference delegated these operations to ITK's C++ filters
// (ConnectedComponentImageFilter, SignedMaurerDistanceMapImageFilter,
// ConnectedThresholdImageFilter, BinaryFillholeImageFilter).  On TPU the
// device paths exist as label-propagation / min-plus sweeps (core/components,
// core/distance); this library provides the complementary O(N) host
// implementations used by post-processing stages where the data is already on
// the host and a single-pass union-find / Felzenszwalb sweep beats launching
// device fixpoint loops.
//
// Exposed as plain C symbols for ctypes binding (no pybind11 in this image).

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

extern "C" {

// -----------------------------------------------------------------------------
// connected components: union-find over a binary mask
// labels output: 0 background, 1..K components (unordered; relabel in caller)
// connectivity: 6 or 26
// returns number of components K
// -----------------------------------------------------------------------------
int cc_label_3d(const uint8_t* mask, int nz, int ny, int nx, int connectivity,
                int32_t* labels_out) {
    const int64_t n = static_cast<int64_t>(nz) * ny * nx;
    std::vector<int32_t> parent(n + 1, 0);

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
        if (a != b) parent[std::max(a, b)] = std::min(a, b);
    };

    // neighbour offsets with index strictly before the current voxel
    std::vector<std::array<int, 3>> offsets;
    if (connectivity == 6) {
        offsets = {{-1, 0, 0}, {0, -1, 0}, {0, 0, -1}};
    } else {
        for (int dz = -1; dz <= 0; ++dz)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dx = -1; dx <= 1; ++dx) {
                    if (dz == 0 && (dy > 0 || (dy == 0 && dx >= 0))) continue;
                    offsets.push_back({dz, dy, dx});
                }
    }

    int32_t next = 0;
    for (int z = 0; z < nz; ++z) {
        for (int y = 0; y < ny; ++y) {
            for (int x = 0; x < nx; ++x) {
                const int64_t idx = (static_cast<int64_t>(z) * ny + y) * nx + x;
                if (!mask[idx]) {
                    labels_out[idx] = 0;
                    continue;
                }
                int32_t lab = 0;
                for (const auto& off : offsets) {
                    const int zz = z + off[0], yy = y + off[1], xx = x + off[2];
                    if (zz < 0 || yy < 0 || yy >= ny || xx < 0 || xx >= nx) continue;
                    const int64_t nidx =
                        (static_cast<int64_t>(zz) * ny + yy) * nx + xx;
                    if (labels_out[nidx] > 0) {
                        if (lab == 0) {
                            lab = labels_out[nidx];
                        } else {
                            unite(lab, labels_out[nidx]);
                        }
                    }
                }
                if (lab == 0) {
                    lab = ++next;
                    parent[lab] = lab;
                }
                labels_out[idx] = lab;
            }
        }
    }

    // flatten + compact labels
    std::vector<int32_t> remap(next + 1, 0);
    int32_t k = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (labels_out[i] > 0) {
            const int32_t root = find(labels_out[i]);
            if (remap[root] == 0) remap[root] = ++k;
            labels_out[i] = remap[root];
        }
    }
    return k;
}

// -----------------------------------------------------------------------------
// exact squared EDT (Felzenszwalb & Huttenlocher): distance to nearest
// non-zero voxel, anisotropic spacing (sx, sy, sz in mm; array is [z,y,x])
// -----------------------------------------------------------------------------
static void edt_1d(const float* f, float* d, int n, double step,
                   std::vector<int>& v, std::vector<double>& zbuf) {
    int k = 0;
    v[0] = 0;
    zbuf[0] = -std::numeric_limits<double>::infinity();
    zbuf[1] = std::numeric_limits<double>::infinity();
    const double s2 = step * step;
    for (int q = 1; q < n; ++q) {
        double s;
        while (true) {
            const int p = v[k];
            s = ((f[q] + s2 * q * q) - (f[p] + s2 * p * p)) / (2.0 * s2 * (q - p));
            if (s <= zbuf[k]) {
                --k;
            } else {
                break;
            }
        }
        ++k;
        v[k] = q;
        zbuf[k] = s;
        zbuf[k + 1] = std::numeric_limits<double>::infinity();
    }
    k = 0;
    for (int q = 0; q < n; ++q) {
        while (zbuf[k + 1] < q) ++k;
        const double dq = (q - v[k]) * step;
        d[q] = static_cast<float>(dq * dq + f[v[k]]);
    }
}

void edt_sq_3d(const uint8_t* mask, int nz, int ny, int nx,
               double sx, double sy, double sz, float* out) {
    const float INF = 1e10f;
    const int64_t n = static_cast<int64_t>(nz) * ny * nx;
    for (int64_t i = 0; i < n; ++i) out[i] = mask[i] ? 0.0f : INF;

    const int nmax = std::max(nz, std::max(ny, nx));
    std::vector<int> v(nmax);
    std::vector<double> zbuf(nmax + 1);
    std::vector<float> line(nmax), dist(nmax);

    // x pass
    for (int z = 0; z < nz; ++z)
        for (int y = 0; y < ny; ++y) {
            float* row = out + (static_cast<int64_t>(z) * ny + y) * nx;
            edt_1d(row, dist.data(), nx, sx, v, zbuf);
            std::memcpy(row, dist.data(), nx * sizeof(float));
        }
    // y pass
    for (int z = 0; z < nz; ++z)
        for (int x = 0; x < nx; ++x) {
            for (int y = 0; y < ny; ++y)
                line[y] = out[(static_cast<int64_t>(z) * ny + y) * nx + x];
            edt_1d(line.data(), dist.data(), ny, sy, v, zbuf);
            for (int y = 0; y < ny; ++y)
                out[(static_cast<int64_t>(z) * ny + y) * nx + x] = dist[y];
        }
    // z pass
    for (int y = 0; y < ny; ++y)
        for (int x = 0; x < nx; ++x) {
            for (int z = 0; z < nz; ++z)
                line[z] = out[(static_cast<int64_t>(z) * ny + y) * nx + x];
            edt_1d(line.data(), dist.data(), nz, sz, v, zbuf);
            for (int z = 0; z < nz; ++z)
                out[(static_cast<int64_t>(z) * ny + y) * nx + x] = dist[z];
        }
}

// -----------------------------------------------------------------------------
// region growing: BFS from seeds through voxels with lower <= v <= upper
// -----------------------------------------------------------------------------
void region_grow_3d(const float* image, int nz, int ny, int nx,
                    const int32_t* seeds_zyx, int n_seeds,
                    float lower, float upper, int connectivity,
                    uint8_t* out) {
    const int64_t n = static_cast<int64_t>(nz) * ny * nx;
    std::memset(out, 0, n);
    std::queue<int64_t> queue;

    auto idx_of = [&](int z, int y, int x) {
        return (static_cast<int64_t>(z) * ny + y) * nx + x;
    };

    for (int s = 0; s < n_seeds; ++s) {
        const int z = seeds_zyx[s * 3 + 0];
        const int y = seeds_zyx[s * 3 + 1];
        const int x = seeds_zyx[s * 3 + 2];
        if (z < 0 || z >= nz || y < 0 || y >= ny || x < 0 || x >= nx) continue;
        const int64_t i = idx_of(z, y, x);
        if (image[i] >= lower && image[i] <= upper && !out[i]) {
            out[i] = 1;
            queue.push(i);
        }
    }

    std::vector<std::array<int, 3>> offsets;
    if (connectivity == 6) {
        offsets = {{-1, 0, 0}, {1, 0, 0},  {0, -1, 0},
                   {0, 1, 0},  {0, 0, -1}, {0, 0, 1}};
    } else {
        for (int dz = -1; dz <= 1; ++dz)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dx = -1; dx <= 1; ++dx)
                    if (dz || dy || dx) offsets.push_back({dz, dy, dx});
    }

    while (!queue.empty()) {
        const int64_t i = queue.front();
        queue.pop();
        const int z = static_cast<int>(i / (static_cast<int64_t>(ny) * nx));
        const int y = static_cast<int>((i / nx) % ny);
        const int x = static_cast<int>(i % nx);
        for (const auto& off : offsets) {
            const int zz = z + off[0], yy = y + off[1], xx = x + off[2];
            if (zz < 0 || zz >= nz || yy < 0 || yy >= ny || xx < 0 || xx >= nx)
                continue;
            const int64_t j = idx_of(zz, yy, xx);
            if (!out[j] && image[j] >= lower && image[j] <= upper) {
                out[j] = 1;
                queue.push(j);
            }
        }
    }
}

// -----------------------------------------------------------------------------
// fill holes: background flood fill from the border; holes = unreached bg
// -----------------------------------------------------------------------------
void fill_holes_3d(const uint8_t* mask, int nz, int ny, int nx,
                   int connectivity, uint8_t* out) {
    const int64_t n = static_cast<int64_t>(nz) * ny * nx;
    std::vector<uint8_t> reached(n, 0);
    std::queue<int64_t> queue;

    auto idx_of = [&](int z, int y, int x) {
        return (static_cast<int64_t>(z) * ny + y) * nx + x;
    };
    auto try_seed = [&](int z, int y, int x) {
        const int64_t i = idx_of(z, y, x);
        if (!mask[i] && !reached[i]) {
            reached[i] = 1;
            queue.push(i);
        }
    };

    for (int y = 0; y < ny; ++y)
        for (int x = 0; x < nx; ++x) {
            try_seed(0, y, x);
            try_seed(nz - 1, y, x);
        }
    for (int z = 0; z < nz; ++z)
        for (int x = 0; x < nx; ++x) {
            try_seed(z, 0, x);
            try_seed(z, ny - 1, x);
        }
    for (int z = 0; z < nz; ++z)
        for (int y = 0; y < ny; ++y) {
            try_seed(z, y, 0);
            try_seed(z, y, nx - 1);
        }

    std::vector<std::array<int, 3>> offsets;
    if (connectivity == 6) {
        offsets = {{-1, 0, 0}, {1, 0, 0},  {0, -1, 0},
                   {0, 1, 0},  {0, 0, -1}, {0, 0, 1}};
    } else {
        for (int dz = -1; dz <= 1; ++dz)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dx = -1; dx <= 1; ++dx)
                    if (dz || dy || dx) offsets.push_back({dz, dy, dx});
    }

    while (!queue.empty()) {
        const int64_t i = queue.front();
        queue.pop();
        const int z = static_cast<int>(i / (static_cast<int64_t>(ny) * nx));
        const int y = static_cast<int>((i / nx) % ny);
        const int x = static_cast<int>(i % nx);
        for (const auto& off : offsets) {
            const int zz = z + off[0], yy = y + off[1], xx = x + off[2];
            if (zz < 0 || zz >= nz || yy < 0 || yy >= ny || xx < 0 || xx >= nx)
                continue;
            const int64_t j = idx_of(zz, yy, xx);
            if (!mask[j] && !reached[j]) {
                reached[j] = 1;
                queue.push(j);
            }
        }
    }

    for (int64_t i = 0; i < n; ++i) out[i] = mask[i] || !reached[i] ? 1 : 0;
}

}  // extern "C"
