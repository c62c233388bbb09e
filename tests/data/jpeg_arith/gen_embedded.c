/* Generator for the q204 arithmetic clips (media ids 24-29):
 * reads W H on argv, raw gray pixels on stdin, writes an
 * arithmetic-coded (SOF9) JPEG at quality 100 (unit quantization)
 * to stdout using the system libjpeg-turbo. The streams produced
 * from the md5 mosaic pattern are embedded base64 in
 * dataingestiontohana_spark/operators/jpeg_arith_fixtures.py —
 * this source documents their provenance.
 *
 *   cc gen_embedded.c -ljpeg -o gen_embedded
 *   python: pixels -> ./gen_embedded W H [restart] [prog] < raw > out.jpg
 * ids 30-31 pass prog=1 (SOF10 progressive arithmetic).
 */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
int main(int argc, char **argv) {
  int w = atoi(argv[1]), h = atoi(argv[2]);
  int restart = argc > 3 ? atoi(argv[3]) : 0;
  int prog = argc > 4 ? atoi(argv[4]) : 0;
  unsigned char *img = malloc((size_t)w * h);
  fread(img, 1, (size_t)w * h, stdin);
  struct jpeg_compress_struct c; struct jpeg_error_mgr e;
  c.err = jpeg_std_error(&e);
  jpeg_create_compress(&c); jpeg_stdio_dest(&c, stdout);
  c.image_width = w; c.image_height = h; c.input_components = 1;
  c.in_color_space = JCS_GRAYSCALE;
  jpeg_set_defaults(&c); jpeg_set_quality(&c, 100, FALSE);
  c.arith_code = TRUE; c.restart_interval = restart;
  if (prog) jpeg_simple_progression(&c);
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    JSAMPROW r = img + (size_t)c.next_scanline * w;
    jpeg_write_scanlines(&c, &r, 1);
  }
  jpeg_finish_compress(&c); jpeg_destroy_compress(&c);
  return 0;
}
