#include "spz_codec.h"

#include <zlib.h>

#include <algorithm>
#include <cmath>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <stdexcept>

namespace tpusplat {
namespace {

constexpr uint32_t kMagic = 0x5053474e;  // "NGSP"
constexpr uint32_t kVersion = 2;
constexpr uint8_t kFlagAntialiased = 0x1;
constexpr int kFractionalBits = 12;
constexpr float kColorScale = 0.15f;
constexpr int32_t kMaxPoints = 10000000;

#pragma pack(push, 1)
struct SpzHeader {
  uint32_t magic;
  uint32_t version;
  uint32_t num_points;
  uint8_t sh_degree;
  uint8_t fractional_bits;
  uint8_t flags;
  uint8_t reserved;
};
#pragma pack(pop)
static_assert(sizeof(SpzHeader) == 16, "header must be 16 bytes");

inline uint8_t clamp_round_u8(float x) {
  float r = std::round(x);
  return static_cast<uint8_t>(r < 0.0f ? 0.0f : (r > 255.0f ? 255.0f : r));
}

// Snap an SH coefficient to an 8-bit bucket center; bucket = 2^(8-bits).
inline uint8_t snap_sh(float x, int bucket) {
  int q = static_cast<int>(std::round(x * 128.0f) + 128.0f);
  q = (q + bucket / 2) / bucket * bucket;
  return static_cast<uint8_t>(std::clamp(q, 0, 255));
}

inline float logistic(float x) { return 1.0f / (1.0f + std::exp(-x)); }
inline float logit(float p) { return std::log(p / (1.0f - p)); }

void append(std::vector<uint8_t>* out, const void* data, size_t n) {
  const auto* p = static_cast<const uint8_t*>(data);
  out->insert(out->end(), p, p + n);
}

}  // namespace

int sh_dim_for_degree(int degree) {
  static const int dims[4] = {0, 3, 8, 15};
  return (degree >= 0 && degree <= 3) ? dims[degree] : 0;
}

int sh_degree_for_dim(int dim) {
  if (dim >= 15) return 3;
  if (dim >= 8) return 2;
  if (dim >= 3) return 1;
  return 0;
}

std::vector<uint8_t> pack_splat(const SplatData& s) {
  const int n = s.num_points;
  const int sh_dim = sh_dim_for_degree(s.sh_degree);
  if (n < 0 || n > kMaxPoints) throw std::runtime_error("spz: bad point count");
  if (static_cast<int>(s.positions.size()) != n * 3 ||
      static_cast<int>(s.log_scales.size()) != n * 3 ||
      static_cast<int>(s.rotations.size()) != n * 4 ||
      static_cast<int>(s.alpha_logits.size()) != n ||
      static_cast<int>(s.sh_dc.size()) != n * 3 ||
      static_cast<int>(s.sh_rest.size()) != n * sh_dim * 3) {
    throw std::runtime_error("spz: inconsistent array sizes");
  }

  std::vector<uint8_t> out;
  out.reserve(sizeof(SpzHeader) + static_cast<size_t>(n) * (9 + 1 + 3 + 3 + 3 + sh_dim * 3));
  SpzHeader hdr{kMagic, kVersion, static_cast<uint32_t>(n),
                static_cast<uint8_t>(s.sh_degree), kFractionalBits,
                static_cast<uint8_t>(s.antialiased ? kFlagAntialiased : 0), 0};
  append(&out, &hdr, sizeof(hdr));

  // Positions: 24-bit little-endian signed fixed point.
  const float fp_scale = static_cast<float>(1 << kFractionalBits);
  for (int i = 0; i < n * 3; i++) {
    const int32_t v = static_cast<int32_t>(std::round(s.positions[i] * fp_scale));
    out.push_back(static_cast<uint8_t>(v & 0xff));
    out.push_back(static_cast<uint8_t>((v >> 8) & 0xff));
    out.push_back(static_cast<uint8_t>((v >> 16) & 0xff));
  }
  // Alphas.
  for (int i = 0; i < n; i++) out.push_back(clamp_round_u8(logistic(s.alpha_logits[i]) * 255.0f));
  // DC colors.
  for (int i = 0; i < n * 3; i++)
    out.push_back(clamp_round_u8(s.sh_dc[i] * (kColorScale * 255.0f) + 127.5f));
  // Scales.
  for (int i = 0; i < n * 3; i++) out.push_back(clamp_round_u8((s.log_scales[i] + 10.0f) * 16.0f));
  // Rotations: normalize, force w >= 0, store xyz.
  for (int i = 0; i < n; i++) {
    const float* q = &s.rotations[i * 4];  // xyzw
    float nrm = std::sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]);
    if (nrm == 0.0f) nrm = 1.0f;
    const float sgn = (q[3] < 0.0f ? -1.0f : 1.0f) / nrm;
    out.push_back(clamp_round_u8(q[0] * sgn * 127.5f + 127.5f));
    out.push_back(clamp_round_u8(q[1] * sgn * 127.5f + 127.5f));
    out.push_back(clamp_round_u8(q[2] * sgn * 127.5f + 127.5f));
  }
  // SH rest: first 9 values per point at 5 bits, remainder at 4 bits.
  const int per_point = sh_dim * 3;
  for (int i = 0; i < n; i++) {
    const float* sh = &s.sh_rest[static_cast<size_t>(i) * per_point];
    int j = 0;
    for (; j < per_point && j < 9; j++) out.push_back(snap_sh(sh[j], 1 << 3));
    for (; j < per_point; j++) out.push_back(snap_sh(sh[j], 1 << 4));
  }
  return out;
}

SplatData unpack_splat(const uint8_t* data, size_t size) {
  if (size < sizeof(SpzHeader)) throw std::runtime_error("spz: truncated header");
  SpzHeader hdr;
  std::memcpy(&hdr, data, sizeof(hdr));
  if (hdr.magic != kMagic) throw std::runtime_error("spz: bad magic");
  if (hdr.version != 2) throw std::runtime_error("spz: unsupported version");
  if (hdr.num_points > static_cast<uint32_t>(kMaxPoints))
    throw std::runtime_error("spz: too many points");
  if (hdr.sh_degree > 3) throw std::runtime_error("spz: unsupported SH degree");

  const int n = static_cast<int>(hdr.num_points);
  const int sh_dim = sh_dim_for_degree(hdr.sh_degree);
  const size_t need = sizeof(SpzHeader) +
                      static_cast<size_t>(n) * (9 + 1 + 3 + 3 + 3 + sh_dim * 3);
  if (size < need) throw std::runtime_error("spz: truncated payload");

  SplatData s;
  s.num_points = n;
  s.sh_degree = hdr.sh_degree;
  s.antialiased = (hdr.flags & kFlagAntialiased) != 0;
  s.positions.resize(n * 3);
  s.log_scales.resize(n * 3);
  s.rotations.resize(n * 4);
  s.alpha_logits.resize(n);
  s.sh_dc.resize(n * 3);
  s.sh_rest.resize(static_cast<size_t>(n) * sh_dim * 3);

  const uint8_t* p = data + sizeof(SpzHeader);
  const float inv_fp = 1.0f / static_cast<float>(1 << hdr.fractional_bits);
  for (int i = 0; i < n * 3; i++, p += 3) {
    int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
    if (v & 0x800000) v -= (1 << 24);
    s.positions[i] = static_cast<float>(v) * inv_fp;
  }
  for (int i = 0; i < n; i++) {
    float a = std::clamp(*p++ / 255.0f, 1e-6f, 1.0f - 1e-6f);
    s.alpha_logits[i] = logit(a);
  }
  for (int i = 0; i < n * 3; i++) s.sh_dc[i] = ((*p++ / 255.0f) - 0.5f) / kColorScale;
  for (int i = 0; i < n * 3; i++) s.log_scales[i] = *p++ / 16.0f - 10.0f;
  for (int i = 0; i < n; i++, p += 3) {
    const float x = p[0] / 127.5f - 1.0f;
    const float y = p[1] / 127.5f - 1.0f;
    const float z = p[2] / 127.5f - 1.0f;
    s.rotations[i * 4 + 0] = x;
    s.rotations[i * 4 + 1] = y;
    s.rotations[i * 4 + 2] = z;
    s.rotations[i * 4 + 3] = std::sqrt(std::max(0.0f, 1.0f - (x * x + y * y + z * z)));
  }
  for (size_t i = 0; i < s.sh_rest.size(); i++) s.sh_rest[i] = (*p++ - 128.0f) / 128.0f;
  return s;
}

bool gzip_bytes(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  z_stream zs{};
  // 16 + MAX_WBITS selects a gzip wrapper; memLevel 9 matches the reference encoder.
  if (deflateInit2(&zs, Z_DEFAULT_COMPRESSION, Z_DEFLATED, 16 + MAX_WBITS, 9,
                   Z_DEFAULT_STRATEGY) != Z_OK)
    return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  out->clear();
  uint8_t buf[16384];
  int rc;
  do {
    zs.next_out = buf;
    zs.avail_out = sizeof(buf);
    rc = deflate(&zs, Z_FINISH);
    if (rc != Z_OK && rc != Z_STREAM_END) {
      deflateEnd(&zs);
      return false;
    }
    append(out, buf, sizeof(buf) - zs.avail_out);
  } while (rc != Z_STREAM_END);
  deflateEnd(&zs);
  return true;
}

bool gunzip_bytes(const uint8_t* data, size_t size, std::vector<uint8_t>* out) {
  z_stream zs{};
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(data);
  zs.avail_in = static_cast<uInt>(size);
  out->clear();
  uint8_t buf[16384];
  int rc;
  do {
    zs.next_out = buf;
    zs.avail_out = sizeof(buf);
    rc = inflate(&zs, Z_NO_FLUSH);
    if (rc != Z_OK && rc != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    append(out, buf, sizeof(buf) - zs.avail_out);
  } while (rc != Z_STREAM_END);
  inflateEnd(&zs);
  return true;
}

bool write_spz(const SplatData& s, const std::string& path) {
  std::vector<uint8_t> raw = pack_splat(s);
  std::vector<uint8_t> gz;
  if (!gzip_bytes(raw, &gz)) return false;
  std::ofstream f(path, std::ios::binary);
  f.write(reinterpret_cast<const char*>(gz.data()), gz.size());
  return f.good();
}

bool read_spz(const std::string& path, SplatData* out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f.good()) return false;
  std::vector<uint8_t> gz(static_cast<size_t>(f.tellg()));
  f.seekg(0);
  f.read(reinterpret_cast<char*>(gz.data()), gz.size());
  if (!f.good()) return false;
  std::vector<uint8_t> raw;
  if (!gunzip_bytes(gz.data(), gz.size(), &raw)) return false;
  *out = unpack_splat(raw.data(), raw.size());
  return true;
}

bool write_ply(const SplatData& s, const std::string& path) {
  const int n = s.num_points;
  const int k = s.num_points > 0
                    ? static_cast<int>(s.sh_rest.size() / (static_cast<size_t>(n) * 3))
                    : 0;
  std::ostringstream hdr;
  hdr << "ply\nformat binary_little_endian 1.0\nelement vertex " << n << "\n";
  for (const char* nm : {"x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"})
    hdr << "property float " << nm << "\n";
  for (int i = 0; i < k * 3; i++) hdr << "property float f_rest_" << i << "\n";
  for (const char* nm : {"opacity", "scale_0", "scale_1", "scale_2", "rot_0", "rot_1",
                         "rot_2", "rot_3"})
    hdr << "property float " << nm << "\n";
  hdr << "end_header\n";

  const int cols = 17 + k * 3;
  std::vector<float> row(cols);
  std::ofstream f(path, std::ios::binary);
  if (!f.good()) return false;
  const std::string h = hdr.str();
  f.write(h.data(), h.size());
  for (int i = 0; i < n; i++) {
    float* w = row.data();
    for (int j = 0; j < 3; j++) *w++ = s.positions[i * 3 + j];
    for (int j = 0; j < 3; j++) *w++ = 0.0f;  // normals
    for (int j = 0; j < 3; j++) *w++ = s.sh_dc[i * 3 + j];
    // [N, S, C] -> channel-major f_rest.
    for (int c = 0; c < 3; c++)
      for (int j = 0; j < k; j++)
        *w++ = s.sh_rest[(static_cast<size_t>(i) * k + j) * 3 + c];
    *w++ = s.alpha_logits[i];
    for (int j = 0; j < 3; j++) *w++ = s.log_scales[i * 3 + j];
    // wxyz field order from xyzw storage.
    *w++ = s.rotations[i * 4 + 3];
    *w++ = s.rotations[i * 4 + 0];
    *w++ = s.rotations[i * 4 + 1];
    *w++ = s.rotations[i * 4 + 2];
    f.write(reinterpret_cast<const char*>(row.data()), cols * sizeof(float));
  }
  return f.good();
}

bool read_ply(const std::string& path, SplatData* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f.good()) return false;
  std::string line;
  if (!std::getline(f, line) || line != "ply") return false;
  if (!std::getline(f, line) || line != "format binary_little_endian 1.0") return false;

  int n = -1;
  std::map<std::string, int> fields;
  int field_idx = 0;
  while (std::getline(f, line)) {
    if (line.rfind("comment", 0) == 0) continue;
    if (line == "end_header") break;
    if (line.rfind("element vertex ", 0) == 0) {
      n = std::stoi(line.substr(15));
      continue;
    }
    if (line.rfind("property float ", 0) == 0) {
      fields[line.substr(15)] = field_idx++;
      continue;
    }
    return false;  // unsupported header line
  }
  if (n < 0 || n > kMaxPoints) return false;

  const int cols = static_cast<int>(fields.size());
  std::vector<float> values(static_cast<size_t>(n) * cols);
  f.read(reinterpret_cast<char*>(values.data()), values.size() * sizeof(float));
  if (!f.good()) return false;

  auto idx = [&fields](const std::string& name) {
    auto it = fields.find(name);
    return it == fields.end() ? -1 : it->second;
  };
  const int xi = idx("x"), yi = idx("y"), zi = idx("z");
  const int s0 = idx("scale_0"), s1 = idx("scale_1"), s2 = idx("scale_2");
  const int rw = idx("rot_0"), rx = idx("rot_1"), ry = idx("rot_2"), rz = idx("rot_3");
  const int oi = idx("opacity");
  const int c0 = idx("f_dc_0"), c1 = idx("f_dc_1"), c2 = idx("f_dc_2");
  for (int i : {xi, yi, zi, s0, s1, s2, rw, rx, ry, rz, oi, c0, c1, c2})
    if (i < 0) return false;

  std::vector<int> rest;
  for (int i = 0; i < 45; i++) {
    const int fi = idx("f_rest_" + std::to_string(i));
    if (fi < 0) break;
    rest.push_back(fi);
  }
  const int k = static_cast<int>(rest.size()) / 3;

  SplatData s;
  s.num_points = n;
  s.sh_degree = sh_degree_for_dim(k);
  s.positions.resize(n * 3);
  s.log_scales.resize(n * 3);
  s.rotations.resize(n * 4);
  s.alpha_logits.resize(n);
  s.sh_dc.resize(n * 3);
  s.sh_rest.resize(static_cast<size_t>(n) * k * 3);
  for (int i = 0; i < n; i++) {
    const float* v = &values[static_cast<size_t>(i) * cols];
    s.positions[i * 3 + 0] = v[xi];
    s.positions[i * 3 + 1] = v[yi];
    s.positions[i * 3 + 2] = v[zi];
    s.log_scales[i * 3 + 0] = v[s0];
    s.log_scales[i * 3 + 1] = v[s1];
    s.log_scales[i * 3 + 2] = v[s2];
    s.rotations[i * 4 + 0] = v[rx];
    s.rotations[i * 4 + 1] = v[ry];
    s.rotations[i * 4 + 2] = v[rz];
    s.rotations[i * 4 + 3] = v[rw];
    s.alpha_logits[i] = v[oi];
    s.sh_dc[i * 3 + 0] = v[c0];
    s.sh_dc[i * 3 + 1] = v[c1];
    s.sh_dc[i * 3 + 2] = v[c2];
    // channel-major f_rest -> [N, S, C].
    for (int j = 0; j < k; j++)
      for (int c = 0; c < 3; c++)
        s.sh_rest[(static_cast<size_t>(i) * k + j) * 3 + c] = v[rest[c * k + j]];
  }
  *out = std::move(s);
  return true;
}

}  // namespace tpusplat
