// C ABI for libspz_converter.so — interop with ctypes / Swift / C#.
// Exposes the same entry point name as the reference shared library.
#include <filesystem>
#include <iostream>

#include "spz_codec.h"

extern "C" {

__attribute__((visibility("default"))) bool ConvertSpzToPly(const char* spz_path,
                                                            const char* ply_path) {
  try {
    if (!std::filesystem::exists(spz_path)) {
      std::cerr << "Error: SPZ file does not exist: " << spz_path << std::endl;
      return false;
    }
    tpusplat::SplatData splat;
    if (!tpusplat::read_spz(spz_path, &splat)) return false;
    return tpusplat::write_ply(splat, ply_path);
  } catch (const std::exception& e) {
    std::cerr << "Exception: " << e.what() << std::endl;
    return false;
  }
}

__attribute__((visibility("default"))) bool ConvertPlyToSpz(const char* ply_path,
                                                            const char* spz_path) {
  try {
    if (!std::filesystem::exists(ply_path)) {
      std::cerr << "Error: PLY file does not exist: " << ply_path << std::endl;
      return false;
    }
    tpusplat::SplatData splat;
    if (!tpusplat::read_ply(ply_path, &splat)) return false;
    return tpusplat::write_spz(splat, spz_path);
  } catch (const std::exception& e) {
    std::cerr << "Exception: " << e.what() << std::endl;
    return false;
  }
}

}  // extern "C"
