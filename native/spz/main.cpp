// splat_converter: .ply <-> .spz command-line converter.
// Usage: splat_converter <input.ply|input.spz>
// Writes the converted file next to the input with the swapped extension,
// matching the reference tool's CLI contract (spz/src/main.cpp behavior).
#include <filesystem>
#include <iostream>

#include "spz_codec.h"

int main(int argc, char** argv) {
  if (argc != 2) {
    std::cerr << "Usage: " << argv[0] << " <input_file>" << std::endl;
    return 1;
  }
  std::filesystem::path in(argv[1]);
  if (!std::filesystem::exists(in)) {
    std::cerr << "Error: File does not exist: " << in << std::endl;
    return 1;
  }
  const std::string ext = in.extension().string();
  try {
    tpusplat::SplatData splat;
    std::filesystem::path out = in;
    if (ext == ".ply") {
      if (!tpusplat::read_ply(in.string(), &splat))
        throw std::runtime_error("failed to read .ply");
      out.replace_extension(".spz");
      if (!tpusplat::write_spz(splat, out.string()))
        throw std::runtime_error("failed to write .spz");
    } else if (ext == ".spz") {
      if (!tpusplat::read_spz(in.string(), &splat))
        throw std::runtime_error("failed to read .spz");
      out.replace_extension(".ply");
      if (!tpusplat::write_ply(splat, out.string()))
        throw std::runtime_error("failed to write .ply");
    } else {
      std::cerr << "Error: Unsupported file extension: " << ext << std::endl;
      return 1;
    }
    std::cout << "Converted " << in << " to " << out << std::endl;
  } catch (const std::exception& e) {
    std::cerr << "Error: " << e.what() << std::endl;
    return 1;
  }
  return 0;
}
