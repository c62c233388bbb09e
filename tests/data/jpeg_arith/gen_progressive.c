#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>
static void md5ish_fill(unsigned char *buf, int n, unsigned seed) {
  unsigned x = seed ? seed : 1;
  for (int i = 0; i < n; i++) {
    x ^= x << 13; x ^= x >> 17; x ^= x << 5;
    buf[i] = (unsigned char)(x & 0xFF);
  }
}
static void enc(const char *path, unsigned char *img, int w, int h,
                int comps, boolean arith, boolean prog, int restart) {
  struct jpeg_compress_struct c; struct jpeg_error_mgr e;
  FILE *f = fopen(path, "wb");
  c.err = jpeg_std_error(&e);
  jpeg_create_compress(&c); jpeg_stdio_dest(&c, f);
  c.image_width = w; c.image_height = h; c.input_components = comps;
  c.in_color_space = comps == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&c); jpeg_set_quality(&c, 100, FALSE);
  c.arith_code = arith; c.restart_interval = restart;
  if (prog) jpeg_simple_progression(&c);
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    JSAMPROW r = img + (size_t)c.next_scanline * w * comps;
    jpeg_write_scanlines(&c, &r, 1);
  }
  jpeg_finish_compress(&c); jpeg_destroy_compress(&c); fclose(f);
}
int main(void) {
  {
    int w = 40, h = 24;
    unsigned char img[40*24];
    md5ish_fill(img, sizeof img, 42);
    enc("gray_noise_progarith.jpg", img, w, h, 1, TRUE, TRUE, 0);
  }
  {
    int w = 32, h = 16;
    unsigned char img[32*16];
    md5ish_fill(img, sizeof img, 99);
    enc("gray_rst_progarith.jpg", img, w, h, 1, TRUE, TRUE, 2);
  }
  {
    int w = 16, h = 16;
    unsigned char img[16*16*3];
    md5ish_fill(img, sizeof img, 777);
    enc("color420_progarith.jpg", img, w, h, 3, TRUE, TRUE, 0);
  }
  {
    int w = 48, h = 32;
    unsigned char img[48*32];
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++)
      img[y*w+x] = (unsigned char)((x*3 + y*2) & 0xFF);
    enc("gray_gradient_progarith.jpg", img, w, h, 1, TRUE, TRUE, 0);
  }
  return 0;
}
