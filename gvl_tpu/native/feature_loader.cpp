// Native feature loader: .npy parse + temporal resize + batch fill.
//
// The reference's input pipeline is torch DataLoader workers running
// numpy/scipy per video (reference: video_dataset.py:305-397). This C++
// loader does the hot path — mmap-free .npy read, nearest/linear temporal
// rescale, zero-padding — without the GIL, so a handful of python producer
// threads scale across cores. Exposed through ctypes (gvl_tpu/native).
//
// Build: g++ -O3 -march=native -shared -fPIC feature_loader.cpp -o libgvl_native.so -lpthread

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <thread>
#include <vector>

namespace {

// Minimal .npy (v1/v2) reader for C-order little-endian f4/f8 2-D arrays.
// Returns true on success; data resized to rows*cols floats.
bool load_npy_f32(const char* path, std::vector<float>& data,
                  int64_t& rows, int64_t& cols) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    unsigned char magic[8];
    if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
        fclose(f);
        return false;
    }
    int major = magic[6];
    uint32_t header_len = 0;
    if (major == 1) {
        unsigned char b[2];
        if (fread(b, 1, 2, f) != 2) { fclose(f); return false; }
        header_len = b[0] | (b[1] << 8);
    } else {
        unsigned char b[4];
        if (fread(b, 1, 4, f) != 4) { fclose(f); return false; }
        header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24);
    }
    std::string header(header_len, '\0');
    if (fread(&header[0], 1, header_len, f) != header_len) {
        fclose(f);
        return false;
    }
    bool f8 = header.find("<f8") != std::string::npos;
    bool f4 = header.find("<f4") != std::string::npos;
    if ((!f4 && !f8) || header.find("'fortran_order': True") != std::string::npos) {
        fclose(f);
        return false;
    }
    size_t sp = header.find("'shape':");
    if (sp == std::string::npos) { fclose(f); return false; }
    size_t lp = header.find('(', sp), rp = header.find(')', sp);
    if (lp == std::string::npos || rp == std::string::npos) {
        fclose(f);
        return false;
    }
    std::string shape = header.substr(lp + 1, rp - lp - 1);
    rows = cols = 0;
    if (sscanf(shape.c_str(), "%ld , %ld", &rows, &cols) != 2) {
        if (sscanf(shape.c_str(), "%ld ,", &rows) == 1) {
            cols = rows;  // 1-D: treat as a single row
            rows = 1;
        } else {
            fclose(f);
            return false;
        }
    }
    int64_t n = rows * cols;
    data.resize(n);
    if (f4) {
        if (fread(data.data(), 4, n, f) != (size_t)n) { fclose(f); return false; }
    } else {
        std::vector<double> tmp(n);
        if (fread(tmp.data(), 8, n, f) != (size_t)n) { fclose(f); return false; }
        for (int64_t i = 0; i < n; ++i) data[i] = (float)tmp[i];
    }
    fclose(f);
    return true;
}

// Temporal rescale matching gvl_tpu.data.features.resize_feature:
// pos_i = i*(T0-1)/(T1-1); nearest rounds half-integers down (left).
void resize_rows(const float* src, int64_t t0, int64_t d, float* dst,
                 int64_t t1, int method) {
    if (t0 == 1) {
        for (int64_t i = 0; i < t1; ++i) memcpy(dst + i * d, src, d * 4);
        return;
    }
    for (int64_t i = 0; i < t1; ++i) {
        double pos = (double)i * (double)(t0 - 1) / (double)(t1 - 1);
        if (method == 0) {  // nearest, ties to the left neighbor
            int64_t idx = (int64_t)ceil(pos - 0.5);
            if (idx < 0) idx = 0;
            if (idx > t0 - 1) idx = t0 - 1;
            memcpy(dst + i * d, src + idx * d, d * 4);
        } else {  // linear
            int64_t lo = (int64_t)floor(pos);
            int64_t hi = lo + 1 < t0 ? lo + 1 : t0 - 1;
            float w = (float)(pos - (double)lo);
            const float* a = src + lo * d;
            const float* b = src + hi * d;
            float* o = dst + i * d;
            for (int64_t j = 0; j < d; ++j) o[j] = a[j] * (1.f - w) + b[j] * w;
        }
    }
}

void load_one(const char* path, int64_t target_t, int64_t d, int method,
              int data_norm, float mean, float var,
              float* out, int32_t* status) {
    std::vector<float> buf;
    int64_t rows = 0, cols = 0;
    if (!load_npy_f32(path, buf, rows, cols) || cols != d || rows < 1) {
        memset(out, 0, sizeof(float) * target_t * d);
        *status = 0;
        return;
    }
    if (data_norm) {
        float inv = 1.0f / sqrtf(var);
        for (auto& v : buf) v = (v - mean) * inv;
    }
    if (rows == target_t) {
        memcpy(out, buf.data(), sizeof(float) * target_t * d);
    } else {
        resize_rows(buf.data(), rows, d, out, target_t, method);
    }
    *status = 1;
}

}  // namespace

extern "C" {

// Load one file into out (target_t x d); status 1 ok / 0 missing-or-bad.
void gvl_load_resize(const char* path, int64_t target_t, int64_t d,
                     int method, int data_norm, float mean, float var,
                     float* out, int32_t* status) {
    load_one(path, target_t, d, method, data_norm, mean, var, out, status);
}

// Threaded batch fill: paths[n] -> out (n x target_t x d).
void gvl_load_batch(const char** paths, int64_t n, int64_t target_t,
                    int64_t d, int method, int data_norm, float mean,
                    float var, float* out, int32_t* status) {
    int64_t workers = std::thread::hardware_concurrency();
    if (workers < 1) workers = 1;
    if (workers > n) workers = n;
    std::vector<std::thread> pool;
    for (int64_t w = 0; w < workers; ++w) {
        pool.emplace_back([&, w]() {
            for (int64_t i = w; i < n; i += workers) {
                load_one(paths[i], target_t, d, method, data_norm, mean, var,
                         out + i * target_t * d, status + i);
            }
        });
    }
    for (auto& t : pool) t.join();
}

}  // extern "C"
