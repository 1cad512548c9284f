/* Minimal libjpeg(-turbo) decode shim for the jpeg_ffi ctypes binding.
 *
 * Why a compiled shim instead of raw ctypes against libjpeg: the
 * classic libjpeg API (a) aborts the process via error_exit unless the
 * caller longjmps out — setjmp/longjmp cannot be expressed through a
 * ctypes callback (the jmp_buf must live in the same native frame that
 * calls into the library; this is the canonical pattern from libjpeg's
 * own example.c) — and (b) checks sizeof(jpeg_decompress_struct)
 * against the caller's compile-time value, which ctypes cannot know
 * portably across libjpeg ABIs. Compiling this file against the
 * system jpeglib.h resolves both, and the build is lazy + optional:
 * no compiler or no headers just means jpeg_ffi.available() == False
 * and callers keep the vendored pure-Python codec.
 *
 * One exported function, C ABI only:
 *
 *   int adl_jpeg_decode_rgb(buf, len, out, out_cap, &w, &h,
 *                           errmsg, errcap)
 *
 *   0  success: *w/*h set, out holds w*h*3 packed RGB bytes
 *  -2  out_cap too small: *w/*h set, nothing written (the two-call
 *      protocol: probe with out_cap=0, allocate exactly, call again)
 *  -1  libjpeg rejected the stream: errmsg holds its message
 *  -3  the stream decoded but with corruption warnings (truncated
 *      entropy data, bad Huffman codes libjpeg resyncs past). libjpeg
 *      zero-pads these; the vendored codec REFUSES them, and the
 *      dispatch contract (corrupt -> ValueError -> stand-in fallback)
 *      must not depend on which decoder is present, so strict it is.
 *
 * Grayscale/YCbCr/4:2:0/progressive all land as RGB (libjpeg's own
 * out_color_space conversion); CMYK/YCCK fail the JCS_RGB request and
 * surface as -1, exactly the ValueError class the caller maps to the
 * vendored-codec fallback chain.
 */

#include <setjmp.h>
#include <stddef.h>
#include <stdio.h>
#include <string.h>

#include <jpeglib.h>

struct adl_err {
    struct jpeg_error_mgr mgr;
    jmp_buf jb;
    char msg[JMSG_LENGTH_MAX];
};

static void adl_error_exit(j_common_ptr cinfo)
{
    struct adl_err *e = (struct adl_err *) cinfo->err;
    (*cinfo->err->format_message)(cinfo, e->msg);
    longjmp(e->jb, 1);
}

/* Corrupt-data warnings must not spam stderr from executor workers,
 * but they MUST still count (the default emit_message is what bumps
 * num_warnings; a plain no-op would silently lose the strictness
 * signal the -3 return depends on). */
static void adl_emit_message(j_common_ptr cinfo, int msg_level)
{
    if (msg_level < 0)
        cinfo->err->num_warnings++;
}

int adl_jpeg_decode_rgb(const unsigned char *buf, unsigned long len,
                        unsigned char *out, size_t out_cap,
                        int *w, int *h, char *errmsg, size_t errcap)
{
    struct jpeg_decompress_struct cinfo;
    struct adl_err jerr;
    size_t need, stride;

    memset(&cinfo, 0, sizeof cinfo);
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = adl_error_exit;
    jerr.mgr.emit_message = adl_emit_message;
    jerr.msg[0] = 0;
    if (setjmp(jerr.jb)) {
        if (errmsg && errcap) {
            strncpy(errmsg, jerr.msg, errcap - 1);
            errmsg[errcap - 1] = 0;
        }
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, (unsigned char *) buf, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_calc_output_dimensions(&cinfo);
    *w = (int) cinfo.output_width;
    *h = (int) cinfo.output_height;
    need = (size_t) cinfo.output_width * cinfo.output_height * 3;
    if (need > out_cap) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    jpeg_start_decompress(&cinfo);
    stride = (size_t) cinfo.output_width * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + stride * cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    if (cinfo.err->num_warnings > 0) {
        if (errmsg && errcap) {
            snprintf(errmsg, errcap, "corrupt JPEG data (%ld warnings)",
                     cinfo.err->num_warnings);
        }
        jpeg_destroy_decompress(&cinfo);
        return -3;
    }
    jpeg_destroy_decompress(&cinfo);
    return 0;
}
