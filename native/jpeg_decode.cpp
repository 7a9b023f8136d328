// Native JPEG decode for the ingest stage (≙ the reference ImageLoader's
// cv::imread, image_loader.cpp:174).  Decodes straight to grayscale via
// libjpeg (JCS_GRAYSCALE skips the RGB round trip).  Exposed as a C API
// consumed through ctypes; calls release the GIL, so the Python ingest
// runs a thread pool over it (one decode per core).
//
// Build: make -C native (libarslam_jpeg.so; requires system libjpeg).

#include <cstddef>
#include <cstdio>  // jpeglib.h needs size_t/FILE declared first

#include <jpeglib.h>

#include <csetjmp>
#include <cstring>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void silent_output(j_common_ptr) {}

// Shared open + header read.  Returns the open FILE* (caller closes) or
// nullptr on failure.  On success the decompress struct has header info.
FILE* open_and_read_header(const char* path, jpeg_decompress_struct* cinfo,
                           ErrorMgr* err) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  cinfo->err = jpeg_std_error(&err->pub);
  err->pub.error_exit = error_exit;
  err->pub.output_message = silent_output;
  if (setjmp(err->jump)) {
    jpeg_destroy_decompress(cinfo);
    std::fclose(f);
    return nullptr;
  }
  jpeg_create_decompress(cinfo);
  jpeg_stdio_src(cinfo, f);
  if (jpeg_read_header(cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(cinfo);
    std::fclose(f);
    return nullptr;
  }
  return f;
}

}  // namespace

extern "C" {

// Image dimensions without decoding.  Returns 0 on success.
int arslam_jpeg_dims(const char* path, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  FILE* f = open_and_read_header(path, &cinfo, &err);
  if (!f) return 1;
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

// Decode to grayscale uint8 rows into ``out`` (capacity ``cap`` bytes).
// Returns 0 on success, 1 on open/parse error, 2 if cap is too small.
int arslam_jpeg_decode_gray(const char* path, unsigned char* out, long cap,
                            int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  FILE* f = open_and_read_header(path, &cinfo, &err);
  if (!f) return 1;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 1;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  const int width = static_cast<int>(cinfo.output_width);
  const int height = static_cast<int>(cinfo.output_height);
  if (static_cast<long>(width) * height > cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<long>(cinfo.output_scanline) * width;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  *w = width;
  *h = height;
  return 0;
}

}  // extern "C"
