// Native voxelizer backend: FDTD adjacency graph from a triangle soup.
//
// Computes, for every grid point near the scene surface, which of its
// NN (6 Cartesian / 12 FCC) legs cross a triangle (semantics of
// /root/reference/python/voxelizer/vox_scene.py:147-280: rays of length
// h_f*(1+eps) cast from point-minus-leg towards each neighbour; grazing
// hits within 1e-6*h_f cut every leg).  Parallelised with OpenMP over
// x-slabs of the grid (slab-local writes, no atomics) — replacing the
// reference's multiprocessing + temp-file orchestration.
//
// Outputs a dense bit-packed adjacency grid (uint16, all-ones for air),
// plus per-point nearest-hit distance and triangle index for the SAF /
// material pass done in Python.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC voxelizer.cpp -o libvox.so

#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>
#include <limits>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double R_EPS = 1e-6;

struct V3 {
    double x, y, z;
};

static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

struct TriPre {
    V3 v0, v1, v2;
    V3 unor, cent;
    V3 eab, ebc, eca;   // outward unit edge normals
    V3 bmin, bmax;
};

// ray-triangle intersection with the reference's edge-function slack
// (tri_ray_intersection.py:79-119); ray_d must be unit length
static inline bool tri_ray(const TriPre& t, V3 ro, V3 rd, double d_eps,
                           double cp_eps, double* dist) {
    double beta = dot(rd, t.unor);
    if (std::fabs(beta) < cp_eps) return false;
    double s = dot(t.unor, sub(t.cent, ro)) / beta;
    if (s < 0) return false;
    V3 pop = {ro.x + rd.x * s, ro.y + rd.y * s, ro.z + rd.z * s};
    V3 mab = {(t.v0.x + t.v1.x) * 0.5, (t.v0.y + t.v1.y) * 0.5,
              (t.v0.z + t.v1.z) * 0.5};
    if (dot(sub(pop, mab), t.eab) > d_eps) return false;
    V3 mbc = {(t.v1.x + t.v2.x) * 0.5, (t.v1.y + t.v2.y) * 0.5,
              (t.v1.z + t.v2.z) * 0.5};
    if (dot(sub(pop, mbc), t.ebc) > d_eps) return false;
    V3 mca = {(t.v2.x + t.v0.x) * 0.5, (t.v2.y + t.v0.y) * 0.5,
              (t.v2.z + t.v0.z) * 0.5};
    if (dot(sub(pop, mca), t.eca) > d_eps) return false;
    *dist = s;
    return true;
}

}  // namespace

extern "C" {

// tris: packed TriPre-compatible doubles, Ntris * 27:
//   v0,v1,v2, unor, cent, eab, ebc, eca, bmin (3 each = 27 doubles)
// vv: NN*3 integer leg vectors; adj_full: (Nx*Ny*Nz) uint16 preset to ones;
// ndist/tidx: per-point nearest hit (f64 inf / i32 -1 preset).
// Returns the number of boundary points found.
int64_t vox_calc_adj(
    const double* tris_raw, int64_t Ntris,
    const double* xv, const double* yv, const double* zv,
    int64_t Nx, int64_t Ny, int64_t Nz,
    double h, int fcc,
    uint16_t* adj_full, double* ndist, int32_t* tidx, uint8_t* nb_flag) {
    const int NN = fcc ? 12 : 6;
    const double hf = fcc ? h * std::sqrt(2.0) : h;
    static const int VV_CART[6][3] = {{1, 0, 0},  {-1, 0, 0}, {0, 1, 0},
                                      {0, -1, 0}, {0, 0, 1},  {0, 0, -1}};
    static const int VV_FCC[12][3] = {
        {1, 1, 0},  {-1, -1, 0}, {0, 1, 1},  {0, -1, -1},
        {1, 0, 1},  {-1, 0, -1}, {1, -1, 0}, {-1, 1, 0},
        {0, 1, -1}, {0, -1, 1},  {1, 0, -1}, {-1, 0, 1}};

    double uvv[12][3];
    double vvh[12][3];
    for (int k = 0; k < NN; k++) {
        const int* v = fcc ? VV_FCC[k] : VV_CART[k];
        double n = std::sqrt(double(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]));
        for (int j = 0; j < 3; j++) {
            uvv[k][j] = v[j] / n;
            vvh[k][j] = v[j] * h;
        }
    }

    const double d_eps = 1e-3 * h;
    const double cp_eps = 1e-6;
    const double margin = hf * (1 + R_EPS);

    // triangle layout (see voxelizer/native.py):
    // v0 v1 v2 unor cent eab ebc eca bmin bmax = 10 triples = 30 doubles
    const int TS = 30;

#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        int nth = 1, tid = 0;
#ifdef _OPENMP
        nth = omp_get_num_threads();
        tid = omp_get_thread_num();
#endif
        // slab of x rows owned by this thread (slab-local writes only)
        int64_t x0 = 1 + (Nx - 2) * tid / nth;
        int64_t x1 = 1 + (Nx - 2) * (tid + 1) / nth;

        for (int64_t ti = 0; ti < Ntris; ti++) {
            const double* T = tris_raw + ti * TS;
            TriPre t;
            t.v0 = {T[0], T[1], T[2]};
            t.v1 = {T[3], T[4], T[5]};
            t.v2 = {T[6], T[7], T[8]};
            t.unor = {T[9], T[10], T[11]};
            t.cent = {T[12], T[13], T[14]};
            t.eab = {T[15], T[16], T[17]};
            t.ebc = {T[18], T[19], T[20]};
            t.eca = {T[21], T[22], T[23]};
            t.bmin = {T[24], T[25], T[26]};
            t.bmax = {T[27], T[28], T[29]};

            // grid-point AABB affected by this triangle (one index of
            // slack so float rounding can never drop a borderline point;
            // the exact per-point tests decide)
            auto lo = [&](const double* v, int64_t N, double b) {
                int64_t i = int64_t(std::ceil((b - margin - v[0]) / h)) - 1;
                return std::max<int64_t>(i, 1);
            };
            auto hi = [&](const double* v, int64_t N, double b) {
                int64_t i = int64_t(std::floor((b + margin - v[0]) / h)) + 1;
                return std::min<int64_t>(i, N - 2);
            };
            int64_t ax0 = std::max(lo(xv, Nx, t.bmin.x), x0);
            int64_t ax1 = std::min(hi(xv, Nx, t.bmax.x), x1 - 1);
            if (ax0 > ax1) continue;
            int64_t ay0 = lo(yv, Ny, t.bmin.y), ay1 = hi(yv, Ny, t.bmax.y);
            int64_t az0 = lo(zv, Nz, t.bmin.z), az1 = hi(zv, Nz, t.bmax.z);

            for (int64_t ix = ax0; ix <= ax1; ix++) {
                for (int64_t iy = ay0; iy <= ay1; iy++) {
                    for (int64_t iz = az0; iz <= az1; iz++) {
                        if (fcc && ((ix + iy + iz) & 1)) continue;
                        V3 p = {xv[ix], yv[iy], zv[iz]};
                        // plane-distance cull
                        double dtp = dot(t.unor, sub(t.cent, p));
                        if (std::fabs(dtp) > margin) continue;

                        int64_t idx = (ix * Ny + iy) * Nz + iz;
                        bool near_b = nb_flag[idx] != 0;
                        for (int k = 0; k < NN; k++) {
                            V3 ro = {p.x - vvh[k][0], p.y - vvh[k][1],
                                     p.z - vvh[k][2]};
                            V3 rd = {uvv[k][0], uvv[k][1], uvv[k][2]};
                            double s;
                            if (!tri_ray(t, ro, rd, d_eps, cp_eps, &s))
                                continue;
                            double dist = s - hf;   // relative to the point
                            if (dist < -R_EPS * hf) continue;  // behind
                            if (std::fabs(dist) <= R_EPS * hf) near_b = true;
                            dist = std::fabs(dist);
                            if (dist > (1 + R_EPS) * hf) continue;
                            adj_full[idx] &= uint16_t(~(1u << k));
                            if (dist < ndist[idx]) {
                                ndist[idx] = dist;
                                tidx[idx] = int32_t(ti);
                            }
                        }
                        if (near_b) {
                            nb_flag[idx] = 1;
                            adj_full[idx] = 0;  // fully rigid
                        }
                    }
                }
            }
        }
    }
    return 0;
}

}  // extern "C"
