/* Minimal libjpeg CLI used ONLY by tests as the independent
 * conformance reference for the vendored Python JPEG codec
 * (tests/test_jpeg_arith.py builds it with gcc when jpeglib.h is
 * available; nothing in the engine links against it).
 *
 *   jpegref decode <in.jpg>  <out.raw>   # writes w h ncomp header line
 *   jpegref encode <in.raw> <w> <h> <ncomp> <quality> <arith 0|1> <out.jpg>
 *                  [progressive 0|1]
 *
 * Raw pixel layout: interleaved row-major 8-bit samples.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static int decode(const char *inpath, const char *outpath)
{
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *in = fopen(inpath, "rb");
  FILE *out = fopen(outpath, "wb");
  if (!in || !out) { perror("open"); return 2; }
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, in);
  jpeg_read_header(&cinfo, TRUE);
  /* no color conversion surprises: report what the file stores when
   * it is not plain grayscale/YCbCr */
  jpeg_start_decompress(&cinfo);
  fprintf(out, "%u %u %d\n", cinfo.output_width, cinfo.output_height,
          cinfo.output_components);
  {
    size_t stride = (size_t)cinfo.output_width * cinfo.output_components;
    JSAMPROW row = malloc(stride);
    while (cinfo.output_scanline < cinfo.output_height) {
      jpeg_read_scanlines(&cinfo, &row, 1);
      fwrite(row, 1, stride, out);
    }
    free(row);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(in); fclose(out);
  return 0;
}

static int encode(const char *inpath, int w, int h, int ncomp, int quality,
                  int arith, const char *outpath, int progressive)
{
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *in = fopen(inpath, "rb");
  FILE *out = fopen(outpath, "wb");
  if (!in || !out) { perror("open"); return 2; }
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, out);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = ncomp;
  cinfo.in_color_space = ncomp == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  if (progressive)
    jpeg_simple_progression(&cinfo);
  if (ncomp == 3) {  /* keep tests simple: 4:4:4 */
    cinfo.comp_info[0].h_samp_factor = 1;
    cinfo.comp_info[0].v_samp_factor = 1;
  }
  jpeg_start_compress(&cinfo, TRUE);
  {
    size_t stride = (size_t)w * ncomp;
    JSAMPROW row = malloc(stride);
    while (cinfo.next_scanline < cinfo.image_height) {
      if (fread(row, 1, stride, in) != stride) { perror("read"); return 3; }
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
    free(row);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(in); fclose(out);
  return 0;
}

int main(int argc, char **argv)
{
  if (argc >= 4 && strcmp(argv[1], "decode") == 0)
    return decode(argv[2], argv[3]);
  if (argc >= 9 && strcmp(argv[1], "encode") == 0)
    return encode(argv[2], atoi(argv[3]), atoi(argv[4]), atoi(argv[5]),
                  atoi(argv[6]), atoi(argv[7]), argv[8],
                  argc > 9 ? atoi(argv[9]) : 0);
  fprintf(stderr, "usage: jpegref decode in.jpg out.raw | "
                  "jpegref encode in.raw w h ncomp quality arith out.jpg\n");
  return 1;
}
