/* Fixture generator for the arithmetic-JPEG interop pins.
 *
 * Encodes each input image TWICE with the system libjpeg-turbo
 * (quality 100 = unit quantization, force_baseline false): once with
 * arith_code = TRUE (SOF9 sequential arithmetic) and once with
 * Huffman baseline. The repo's pure-python decoder must produce
 * BIT-IDENTICAL pixels from both streams of the same image - a
 * third-party interop pin that needs no codec library at test time.
 *
 * Build/run (done once; outputs are committed):
 *   cc gen_fixtures.c -ljpeg -o gen && ./gen
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void md5ish_fill(unsigned char *buf, int n, unsigned seed) {
  /* deterministic filler (xorshift) - provenance documented, the
   * fixture bytes themselves are what is pinned */
  unsigned x = seed ? seed : 1;
  for (int i = 0; i < n; i++) {
    x ^= x << 13; x ^= x >> 17; x ^= x << 5;
    buf[i] = (unsigned char)(x & 0xFF);
  }
}

static void write_jpeg(const char *path, unsigned char *img, int w, int h,
                       int comps, boolean arith, int restart) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *f = fopen(path, "wb");
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = comps;
  cinfo.in_color_space = comps == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, 100, FALSE); /* unit quant tables */
  cinfo.arith_code = arith;
  cinfo.restart_interval = restart;
  if (comps == 3) { /* 4:4:4 - chroma subsampling off */
    for (int c = 0; c < 3; c++) {
      cinfo.comp_info[c].h_samp_factor = 1;
      cinfo.comp_info[c].v_samp_factor = 1;
    }
  }
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = img + (size_t)cinfo.next_scanline * w * comps;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
}

int main(void) {
  /* 1: 24x16 constant-block mosaic (q204 scheme: exact decode) */
  {
    int w = 24, h = 16;
    unsigned char img[24 * 16], consts[6];
    md5ish_fill(consts, 6, 7);
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        img[y * w + x] = consts[(y / 8) * 3 + (x / 8)];
    write_jpeg("gray_mosaic_arith.jpg", img, w, h, 1, TRUE, 0);
    write_jpeg("gray_mosaic_huff.jpg", img, w, h, 1, FALSE, 0);
    FILE *f = fopen("gray_mosaic.raw", "wb");
    fwrite(img, 1, sizeof img, f); fclose(f);
  }
  /* 2: 40x24 gray noise (every AC path exercised) */
  {
    int w = 40, h = 24;
    unsigned char img[40 * 24];
    md5ish_fill(img, sizeof img, 42);
    write_jpeg("gray_noise_arith.jpg", img, w, h, 1, TRUE, 0);
    write_jpeg("gray_noise_huff.jpg", img, w, h, 1, FALSE, 0);
  }
  /* 3: gray noise with restart markers (coder reinit path) */
  {
    int w = 32, h = 16;
    unsigned char img[32 * 16];
    md5ish_fill(img, sizeof img, 99);
    write_jpeg("gray_rst_arith.jpg", img, w, h, 1, TRUE, 2);
    write_jpeg("gray_rst_huff.jpg", img, w, h, 1, FALSE, 2);
  }
  /* 4: 16x16 color 4:4:4 noise (3-component interleaved MCU) */
  {
    int w = 16, h = 16;
    unsigned char img[16 * 16 * 3];
    md5ish_fill(img, sizeof img, 1234);
    write_jpeg("color444_arith.jpg", img, w, h, 3, TRUE, 0);
    write_jpeg("color444_huff.jpg", img, w, h, 3, FALSE, 0);
  }
  /* 4b: 16x16 color 4:2:0 noise (libjpeg default subsampling -
   * 6-block MCUs, per-component DC contexts across a 2x2 luma grid) */
  {
    int w = 16, h = 16;
    unsigned char img[16 * 16 * 3];
    md5ish_fill(img, sizeof img, 777);
    struct jpeg_compress_struct c; struct jpeg_error_mgr e;
    FILE *fa = fopen("color420_arith.jpg", "wb");
    c.err = jpeg_std_error(&e);
    jpeg_create_compress(&c); jpeg_stdio_dest(&c, fa);
    c.image_width = w; c.image_height = h; c.input_components = 3;
    c.in_color_space = JCS_RGB;
    jpeg_set_defaults(&c); jpeg_set_quality(&c, 100, FALSE);
    c.arith_code = TRUE;  /* default 2x1x1 sampling kept */
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
      JSAMPROW r = img + (size_t)c.next_scanline * w * 3;
      jpeg_write_scanlines(&c, &r, 1);
    }
    jpeg_finish_compress(&c); jpeg_destroy_compress(&c); fclose(fa);
    struct jpeg_compress_struct c2; struct jpeg_error_mgr e2;
    FILE *fh = fopen("color420_huff.jpg", "wb");
    c2.err = jpeg_std_error(&e2);
    jpeg_create_compress(&c2); jpeg_stdio_dest(&c2, fh);
    c2.image_width = w; c2.image_height = h; c2.input_components = 3;
    c2.in_color_space = JCS_RGB;
    jpeg_set_defaults(&c2); jpeg_set_quality(&c2, 100, FALSE);
    jpeg_start_compress(&c2, TRUE);
    while (c2.next_scanline < c2.image_height) {
      JSAMPROW r = img + (size_t)c2.next_scanline * w * 3;
      jpeg_write_scanlines(&c2, &r, 1);
    }
    jpeg_finish_compress(&c2); jpeg_destroy_compress(&c2); fclose(fh);
  }
  /* 5: smooth gradient (long zero runs, EOB-heavy) */
  {
    int w = 48, h = 32;
    unsigned char img[48 * 32];
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        img[y * w + x] = (unsigned char)((x * 3 + y * 2) & 0xFF);
    write_jpeg("gray_gradient_arith.jpg", img, w, h, 1, TRUE, 0);
    write_jpeg("gray_gradient_huff.jpg", img, w, h, 1, FALSE, 0);
  }
  return 0;
}
