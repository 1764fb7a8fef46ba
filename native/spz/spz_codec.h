// tpu-splat native SPZ codec.
//
// Implements the Niantic SPZ v2 container (gzip-wrapped quantized gaussian arrays)
// and the INRIA gaussian-splat .ply interchange layout. Byte-compatible with the
// reference toolchain's converter (format spec studied from the reference's
// vendored codec at source/.../spz/src/cc/load-spz.cc; this is an independent
// implementation).
//
// In-memory layout mirrors the Python GaussianCloud type in tpu_splat/core/types.py
// except rotations, which are kept xyzw here to match the SPZ wire convention.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace tpusplat {

struct SplatData {
  int32_t num_points = 0;
  int32_t sh_degree = 0;  // 0..3
  bool antialiased = false;
  std::vector<float> positions;  // N*3
  std::vector<float> log_scales;  // N*3
  std::vector<float> rotations;  // N*4, xyzw
  std::vector<float> alpha_logits;  // N
  std::vector<float> sh_dc;  // N*3
  std::vector<float> sh_rest;  // N*K*3, coeff-major, RGB innermost
};

int sh_dim_for_degree(int degree);
int sh_degree_for_dim(int dim);

// SPZ container.
std::vector<uint8_t> pack_splat(const SplatData& s);          // header + raw arrays
SplatData unpack_splat(const uint8_t* data, size_t size);     // inverse of pack
bool write_spz(const SplatData& s, const std::string& path);  // gzip(pack_splat)
bool read_spz(const std::string& path, SplatData* out);

// INRIA .ply interchange.
bool write_ply(const SplatData& s, const std::string& path);
bool read_ply(const std::string& path, SplatData* out);

// gzip helpers (exposed for tests).
bool gzip_bytes(const std::vector<uint8_t>& in, std::vector<uint8_t>* out);
bool gunzip_bytes(const uint8_t* data, size_t size, std::vector<uint8_t>* out);

}  // namespace tpusplat
