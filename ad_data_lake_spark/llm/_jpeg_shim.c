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
#include <stdlib.h>
#include <string.h>

#include <jpeglib.h>

struct adl_err {
    struct jpeg_error_mgr mgr;
    jmp_buf jb;
    char msg[JMSG_LENGTH_MAX];
    /* mem-destination leak guard: *free_slot is the CURRENT output
     * buffer pointer (libjpeg's mem destination writes reallocations
     * straight back through the caller's pointer), free_base the
     * caller-owned region it started as. On error_exit, a buffer that
     * libjpeg realloc'd (slot != base) would otherwise leak —
     * jpeg_destroy does not free mem-dest output buffers. */
    unsigned char **free_slot;
    unsigned char *free_base;
};

static void adl_error_exit(j_common_ptr cinfo)
{
    struct adl_err *e = (struct adl_err *) cinfo->err;
    (*cinfo->err->format_message)(cinfo, e->msg);
    if (e->free_slot && *e->free_slot != e->free_base) {
        free(*e->free_slot);
        *e->free_slot = e->free_base;
    }
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

/* Encode packed RGB to a baseline 4:4:4 JPEG at ``quality``.
 *
 *   0  success: *out (malloc'd by libjpeg's mem destination — release
 *      with adl_jpeg_free) and *outlen are set
 *  -1  libjpeg error: errmsg holds its message
 *
 * 4:4:4 is forced (libjpeg defaults to 2x2 chroma subsampling) so the
 * stream class matches the vendored encoder exactly: one block per
 * component per 8x8 tile, which is what keeps solid (DC-only) blocks
 * value-exact through ANY conforming decoder — the premise the
 * video_frame_stats_mp4 oracle rests on. */
int adl_jpeg_encode_rgb(const unsigned char *rgb, int w, int h, int quality,
                        unsigned char **out, unsigned long *outlen,
                        char *errmsg, size_t errcap)
{
    struct jpeg_compress_struct cinfo;
    struct adl_err jerr;
    unsigned char *buf = NULL;
    unsigned long sz = 0;
    int ci;

    memset(&cinfo, 0, sizeof cinfo);
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = adl_error_exit;
    jerr.mgr.emit_message = adl_emit_message;
    jerr.msg[0] = 0;
    jerr.free_slot = NULL;
    jerr.free_base = NULL;
    if (setjmp(jerr.jb)) {
        if (errmsg && errcap) {
            strncpy(errmsg, jerr.msg, errcap - 1);
            errmsg[errcap - 1] = 0;
        }
        jpeg_destroy_compress(&cinfo);
        return -1;
    }
    jpeg_create_compress(&cinfo);
    jerr.free_slot = &buf;  /* libjpeg owns this allocation until we return it */
    jpeg_mem_dest(&cinfo, &buf, &sz);
    cinfo.image_width = (JDIMENSION) w;
    cinfo.image_height = (JDIMENSION) h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    for (ci = 0; ci < cinfo.num_components; ci++) {
        cinfo.comp_info[ci].h_samp_factor = 1;
        cinfo.comp_info[ci].v_samp_factor = 1;
    }
    jpeg_start_compress(&cinfo, TRUE);
    {
        size_t stride = (size_t) w * 3;
        while (cinfo.next_scanline < cinfo.image_height) {
            JSAMPROW row =
                (JSAMPROW) (rgb + stride * cinfo.next_scanline);
            jpeg_write_scanlines(&cinfo, &row, 1);
        }
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    *out = buf;
    *outlen = sz;
    return 0;
}

void adl_jpeg_free(unsigned char *p)
{
    free(p);
}

/* Encode n SAME-SIZE RGB frames (packed contiguously, n*w*h*3 bytes)
 * into ``out`` back-to-back, one compress object reused across frames
 * (the per-call Python/ctypes marshal was ~16 us/frame — at Arrow
 * batch sizes that dwarfed the ~6 us of actual compression; one call
 * per BATCH removes it). sizes[i] receives each frame's byte length.
 *
 *   0  success
 *  -1  libjpeg error (errmsg set)
 *  -2  out_cap too small (errmsg set; high-entropy frames at high
 *      quality CAN exceed raw size — the Python caller grows the
 *      buffer and retries the whole batch)
 */
int adl_jpeg_encode_batch(const unsigned char *rgb, int n, int w, int h,
                          int quality, unsigned char *out, size_t out_cap,
                          unsigned long *sizes, char *errmsg, size_t errcap)
{
    struct jpeg_compress_struct cinfo;
    struct adl_err jerr;
    size_t pos = 0;
    size_t frame_px = (size_t) w * h * 3;
    int i, ci;

    memset(&cinfo, 0, sizeof cinfo);
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = adl_error_exit;
    jerr.mgr.emit_message = adl_emit_message;
    jerr.msg[0] = 0;
    jerr.free_slot = NULL;
    jerr.free_base = NULL;
    if (setjmp(jerr.jb)) {
        if (errmsg && errcap) {
            strncpy(errmsg, jerr.msg, errcap - 1);
            errmsg[errcap - 1] = 0;
        }
        jpeg_destroy_compress(&cinfo);
        return -1;
    }
    jpeg_create_compress(&cinfo);
    /* parameters once for the whole batch — per-frame
     * jpeg_set_defaults/set_quality rebuilds quant+Huffman tables and
     * dominated the per-frame cost at 16x16 frame sizes */
    cinfo.image_width = (JDIMENSION) w;
    cinfo.image_height = (JDIMENSION) h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    for (ci = 0; ci < cinfo.num_components; ci++) {
        cinfo.comp_info[ci].h_samp_factor = 1;
        cinfo.comp_info[ci].v_samp_factor = 1;
    }
    for (i = 0; i < n; i++) {
        unsigned char *dst = out + pos;
        unsigned long dst_sz = (unsigned long) (out_cap - pos);
        unsigned char *dst0 = dst;
        size_t stride = (size_t) w * 3;

        if (out_cap - pos < frame_px / 4 + 1024) {
            if (errmsg && errcap) {
                snprintf(errmsg, errcap,
                         "out_cap %zu exhausted at frame %d/%d "
                         "(%zu bytes free)", out_cap, i, n,
                         out_cap - pos);
            }
            jpeg_destroy_compress(&cinfo);
            return -2;
        }
        jerr.free_slot = &dst;
        jerr.free_base = dst0;
        jpeg_mem_dest(&cinfo, &dst, &dst_sz);
        jpeg_start_compress(&cinfo, TRUE);
        while (cinfo.next_scanline < cinfo.image_height) {
            JSAMPROW row = (JSAMPROW) (rgb + (size_t) i * frame_px
                                       + stride * cinfo.next_scanline);
            jpeg_write_scanlines(&cinfo, &row, 1);
        }
        jpeg_finish_compress(&cinfo);
        if (dst != dst0) {
            /* the stream outgrew the remaining buffer and libjpeg
             * realloc'd its own — caller must retry with more room */
            free(dst);
            if (errmsg && errcap) {
                snprintf(errmsg, errcap,
                         "frame %d/%d outgrew remaining out_cap "
                         "(%lu > %zu bytes)", i, n, dst_sz,
                         out_cap - pos);
            }
            jpeg_destroy_compress(&cinfo);
            return -2;
        }
        sizes[i] = dst_sz;
        pos += dst_sz;
    }
    jpeg_destroy_compress(&cinfo);
    return 0;
}

/* Decode n JPEGs (byte ranges offsets[i]..+sizes[i] of ``buf``), each
 * REQUIRED to decode to exactly w x h RGB, into ``out`` packed
 * contiguously (n*w*h*3 bytes). One decompress object reused. Strict:
 * corruption warnings anywhere in the batch fail it (-3), dimension
 * mismatch fails (-4) — the batch caller knows every frame's shape
 * from the container header, so a mismatch is corruption, not a
 * negotiation. */
int adl_jpeg_decode_batch(const unsigned char *buf,
                          const unsigned long *offsets,
                          const unsigned long *sizes, int n, int w, int h,
                          unsigned char *out, char *errmsg, size_t errcap)
{
    struct jpeg_decompress_struct cinfo;
    struct adl_err jerr;
    size_t frame_px = (size_t) w * h * 3;
    size_t stride = (size_t) w * 3;
    int i;

    memset(&cinfo, 0, sizeof cinfo);
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = adl_error_exit;
    jerr.mgr.emit_message = adl_emit_message;
    jerr.msg[0] = 0;
    jerr.free_slot = NULL;
    jerr.free_base = NULL;
    if (setjmp(jerr.jb)) {
        if (errmsg && errcap) {
            strncpy(errmsg, jerr.msg, errcap - 1);
            errmsg[errcap - 1] = 0;
        }
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    for (i = 0; i < n; i++) {
        jpeg_mem_src(&cinfo, (unsigned char *) buf + offsets[i], sizes[i]);
        jpeg_read_header(&cinfo, TRUE);
        cinfo.out_color_space = JCS_RGB;
        jpeg_calc_output_dimensions(&cinfo);
        if ((int) cinfo.output_width != w || (int) cinfo.output_height != h) {
            if (errmsg && errcap) {
                snprintf(errmsg, errcap,
                         "frame %d is %ux%u, expected %dx%d", i,
                         cinfo.output_width, cinfo.output_height, w, h);
            }
            jpeg_destroy_decompress(&cinfo);
            return -4;
        }
        jpeg_start_decompress(&cinfo);
        while (cinfo.output_scanline < cinfo.output_height) {
            JSAMPROW row = out + (size_t) i * frame_px
                           + stride * cinfo.output_scanline;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
        jpeg_finish_decompress(&cinfo);
    }
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
    jerr.free_slot = NULL;
    jerr.free_base = NULL;
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
