// Native host runtime for multiple_object_tracking_lidar_tpu.
//
// The reference's runtime is C++ (ROS node on PCL/Eigen); the TPU rebuild
// keeps the per-frame compute on device, but the host-side hot path — the
// PointCloud2 byte-layout decode feeding the H2D transfer (the equivalent of
// pcl::fromROSMsg, ref src/multiple_object_tracking_lidar.cpp:448-449) — is
// implemented natively here and exposed through a C ABI for ctypes.
//
// Build:  make -C native     (produces libmotl_host.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Decode one PointCloud2 buffer into a padded (n_max, 3) float32 tensor and
// a uint8 validity mask.  Field values are float32 at the given byte offsets
// (the canonical XYZ layout); non-finite points are dropped.  Returns the
// number of valid points written (<= n_max); the true pre-truncation count
// is written to *n_seen for overflow accounting.
long motl_decode_pc2_f32(
    const uint8_t* data,
    long n_points,
    int point_step,
    int x_off,
    int y_off,
    int z_off,
    int is_bigendian,
    float* out_xyz,     // (n_max, 3), caller-zeroed or not (we pad)
    uint8_t* out_mask,  // (n_max,)
    long n_max,
    long* n_seen)
{
    long w = 0;
    long seen = 0;
    auto load = [is_bigendian](const uint8_t* p) -> float {
        uint32_t v;
        std::memcpy(&v, p, 4);
        if (is_bigendian) {
            v = __builtin_bswap32(v);
        }
        float f;
        std::memcpy(&f, &v, 4);
        return f;
    };
    for (long i = 0; i < n_points; ++i) {
        const uint8_t* rec = data + i * point_step;
        float x = load(rec + x_off);
        float y = load(rec + y_off);
        float z = load(rec + z_off);
        if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) {
            continue;
        }
        ++seen;
        if (w < n_max) {
            out_xyz[3 * w + 0] = x;
            out_xyz[3 * w + 1] = y;
            out_xyz[3 * w + 2] = z;
            out_mask[w] = 1;
            ++w;
        }
    }
    for (long i = w; i < n_max; ++i) {
        out_xyz[3 * i + 0] = 0.0f;
        out_xyz[3 * i + 1] = 0.0f;
        out_xyz[3 * i + 2] = 0.0f;
        out_mask[i] = 0;
    }
    if (n_seen) {
        *n_seen = seen;
    }
    return w;
}

// glibc TYPE_3 rand() stream -> n RGBA colors, matching the reference's
// srand(5323) marker colors (cpp:75, 537-542) bit-for-bit.
void motl_glibc_colors(unsigned seed, int n, float* out_rgba)
{
    // initstate: r[0]=seed; r[i] = (16807 r[i-1]) % 2147483647 via Schrage
    std::vector<int32_t> r(344 + 3 * (size_t)(n > 0 ? n : 1));
    int64_t word = seed % 2147483647;
    if (word == 0) word = 1;
    r[0] = (int32_t)word;
    for (int i = 1; i < 31; ++i) {
        int64_t hi = word / 127773;
        int64_t lo = word % 127773;
        word = 16807 * lo - 2836 * hi;
        if (word < 0) word += 2147483647;
        r[i] = (int32_t)word;
    }
    for (int i = 31; i < 34; ++i) r[i] = r[i - 31];
    // generate: r[i] = r[i-3] + r[i-31] (mod 2^32); first 310 outputs dropped
    int total = 344 + 3 * n;
    for (int i = 34; i < total; ++i) {
        r[i] = (int32_t)((uint32_t)r[i - 3] + (uint32_t)r[i - 31]);
    }
    const float rand_max = 2147483647.0f;
    for (int k = 0; k < n; ++k) {
        for (int c = 0; c < 3; ++c) {
            uint32_t v = (uint32_t)r[344 + 3 * k + c] >> 1;
            out_rgba[4 * k + c] = (float)v / rand_max;
        }
        out_rgba[4 * k + 3] = 0.8f;
    }
}

}  // extern "C"
