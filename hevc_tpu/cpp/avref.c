/* avref — test/bench harness around system libavcodec.
 *
 * Used ONLY for (a) conformance oracle: decode this framework's HEVC output
 * with an independent decoder, (b) baseline measurement: encode fixtures with
 * libx265 to establish the quality/speed baseline (BASELINE.md), and
 * (c) optional ingest of non-raw inputs.  The framework's own HEVC encode
 * path is first-party (JAX/Pallas + hevc_tpu/cpp/entropy.cpp).
 *
 * Build: make -C hevc_tpu/cpp  (produces libavref.so)
 */
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <string.h>
#include <stdlib.h>

static int frame_bps(const AVFrame *frame)
{
    switch (frame->format) {
    case AV_PIX_FMT_YUV420P10LE:
    case AV_PIX_FMT_YUV420P12LE:
    case AV_PIX_FMT_P010LE:
        return 2;
    default:
        return 1;
    }
}

static int frame_bits(const AVFrame *frame)
{
    switch (frame->format) {
    case AV_PIX_FMT_YUV420P10LE: case AV_PIX_FMT_P010LE: return 10;
    case AV_PIX_FMT_YUV420P12LE: return 12;
    default: return 8;
    }
}

static long copy_frame(const AVFrame *frame, uint8_t *out, long off, long cap)
{
    int w = frame->width, h = frame->height;
    int bps = frame_bps(frame);
    if (off + (long)w * h * 3 / 2 * bps > cap) return -1;
    for (int r = 0; r < h; r++, off += (long)w * bps)
        memcpy(out + off, frame->data[0] + (long)r * frame->linesize[0],
               (long)w * bps);
    for (int c = 1; c <= 2; c++)
        for (int r = 0; r < h / 2; r++, off += (long)(w / 2) * bps)
            memcpy(out + off, frame->data[c] + (long)r * frame->linesize[c],
                   (long)(w / 2) * bps);
    return off;
}

/* Decode the first video stream of any container/elementary file into planar
 * YUV420 frames, written sequentially into out. *out_w gets the width,
 * *out_h gets height | (bit_depth << 16). Returns frame count or <0. */
int avref_decode_file(const char *path, uint8_t *out, long out_cap,
                      int *out_w, int *out_h, int max_frames)
{
    AVFormatContext *fmt = NULL;
    if (avformat_open_input(&fmt, path, NULL, NULL) < 0) return -1;
    if (avformat_find_stream_info(fmt, NULL) < 0) return -2;
    int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, NULL, 0);
    if (vs < 0) return -3;
    const AVCodec *codec =
        avcodec_find_decoder(fmt->streams[vs]->codecpar->codec_id);
    if (!codec) return -4;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(ctx, fmt->streams[vs]->codecpar);
    if (avcodec_open2(ctx, codec, NULL) < 0) return -5;

    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    int nframes = 0, err = 0, eof = 0;
    long off = 0;

    while (!err && nframes < max_frames) {
        if (!eof) {
            int r = av_read_frame(fmt, pkt);
            if (r < 0) { eof = 1; avcodec_send_packet(ctx, NULL); }
            else {
                if (pkt->stream_index == vs)
                    avcodec_send_packet(ctx, pkt);
                av_packet_unref(pkt);
            }
        }
        int got = 0;
        while (avcodec_receive_frame(ctx, frame) == 0 && nframes < max_frames) {
            got = 1;
            *out_w = frame->width;
            *out_h = frame->height | (frame_bits(frame) << 16);
            off = copy_frame(frame, out, off, out_cap);
            if (off < 0) { err = -6; break; }
            nframes++;
        }
        if (eof && !got) break;
    }
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return err ? err : nframes;
}

/* Decode the first audio stream of a file to interleaved s16 PCM.
 * Returns number of samples (per channel), or negative error. */
long avref_decode_audio(const char *path, int16_t *out, long cap_samples,
                        int *out_rate, int *out_channels)
{
    AVFormatContext *fmt = NULL;
    if (avformat_open_input(&fmt, path, NULL, NULL) < 0) return -1;
    if (avformat_find_stream_info(fmt, NULL) < 0) return -2;
    int as = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, NULL, 0);
    if (as < 0) { avformat_close_input(&fmt); return -3; }
    const AVCodec *codec =
        avcodec_find_decoder(fmt->streams[as]->codecpar->codec_id);
    if (!codec) { avformat_close_input(&fmt); return -4; }
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(ctx, fmt->streams[as]->codecpar);
    if (avcodec_open2(ctx, codec, NULL) < 0) return -5;
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    long n = 0;
    int ch = 0, rate = 0, eof = 0, err = 0;
    while (!err) {
        if (!eof) {
            int r = av_read_frame(fmt, pkt);
            if (r < 0) { eof = 1; avcodec_send_packet(ctx, NULL); }
            else {
                if (pkt->stream_index == as) avcodec_send_packet(ctx, pkt);
                av_packet_unref(pkt);
            }
        }
        int got = 0;
        while (avcodec_receive_frame(ctx, frame) == 0) {
            got = 1;
            ch = frame->ch_layout.nb_channels;
            rate = frame->sample_rate;
            if ((n + frame->nb_samples) * ch > cap_samples * ch) { err = -6; break; }
            /* convert any sample format to interleaved s16 (simple cases) */
            for (int i = 0; i < frame->nb_samples; i++) {
                for (int c = 0; c < ch; c++) {
                    float v = 0;
                    switch (frame->format) {
                    case AV_SAMPLE_FMT_FLTP:
                        v = ((float *)frame->data[c])[i]; break;
                    case AV_SAMPLE_FMT_FLT:
                        v = ((float *)frame->data[0])[i * ch + c]; break;
                    case AV_SAMPLE_FMT_S16P:
                        v = ((int16_t *)frame->data[c])[i] / 32768.0f; break;
                    case AV_SAMPLE_FMT_S16:
                        v = ((int16_t *)frame->data[0])[i * ch + c] / 32768.0f; break;
                    case AV_SAMPLE_FMT_S32P:
                        v = ((int32_t *)frame->data[c])[i] / 2147483648.0f; break;
                    default: v = 0;
                    }
                    float s = v * 32767.0f;
                    if (s > 32767) s = 32767;
                    if (s < -32768) s = -32768;
                    out[(n + i) * ch + c] = (int16_t)s;
                }
            }
            n += frame->nb_samples;
        }
        if (eof && !got) break;
    }
    *out_rate = rate; *out_channels = ch;
    av_frame_free(&frame); av_packet_free(&pkt);
    avcodec_free_context(&ctx); avformat_close_input(&fmt);
    return err ? err : n;
}

/* Encode interleaved s16 PCM to AAC-LC. Output: sequence of
 * [int32 size][payload] packets. Returns total bytes or negative error. */
long avref_encode_aac(const int16_t *pcm, long n_samples, int rate,
                      int channels, int bitrate, uint8_t *out, long cap)
{
    const AVCodec *codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    ctx->sample_rate = rate;
    av_channel_layout_default(&ctx->ch_layout, channels);
    ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
    ctx->bit_rate = bitrate;
    ctx->time_base = (AVRational){1, rate};
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -2; }
    AVFrame *frame = av_frame_alloc();
    frame->format = ctx->sample_fmt;
    frame->nb_samples = ctx->frame_size;
    av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
    av_frame_get_buffer(frame, 0);
    AVPacket *pkt = av_packet_alloc();
    long off = 0, pos = 0;
    int err = 0;
    int64_t pts = 0;
    while (!err) {
        AVFrame *f = NULL;
        if (pos < n_samples) {
            av_frame_make_writable(frame);
            int ns = ctx->frame_size;
            if (pos + ns > n_samples) ns = (int)(n_samples - pos);
            frame->nb_samples = ns;
            for (int c = 0; c < channels; c++) {
                float *dst = (float *)frame->data[c];
                for (int i = 0; i < ns; i++)
                    dst[i] = pcm[(pos + i) * channels + c] / 32768.0f;
            }
            frame->pts = pts;
            pts += ns;
            pos += ns;
            f = frame;
        }
        if (avcodec_send_frame(ctx, f) < 0) { err = -3; break; }
        while (avcodec_receive_packet(ctx, pkt) == 0) {
            if (off + 4 + pkt->size > cap) { err = -4; break; }
            out[off] = pkt->size & 0xFF;
            out[off + 1] = (pkt->size >> 8) & 0xFF;
            out[off + 2] = (pkt->size >> 16) & 0xFF;
            out[off + 3] = (pkt->size >> 24) & 0xFF;
            memcpy(out + off + 4, pkt->data, pkt->size);
            off += 4 + pkt->size;
            av_packet_unref(pkt);
        }
        if (!f) break;
    }
    av_packet_free(&pkt); av_frame_free(&frame); avcodec_free_context(&ctx);
    return err ? err : off;
}

/* Encode planar YUV420 frames with a named encoder (e.g. "libx265").
 * opts: comma-separated "key=value" private options (e.g. x265-params).
 * Returns bitstream bytes written, or negative error. */
long avref_encode(const char *enc_name, const uint8_t *yuv,
                  int w, int h, int nframes, int fps_num, int fps_den,
                  int crf, const char *preset, const char *opts,
                  uint8_t *out, long out_cap)
{
    const AVCodec *codec = avcodec_find_encoder_by_name(enc_name);
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    ctx->width = w; ctx->height = h;
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->time_base = (AVRational){fps_den, fps_num};
    ctx->framerate = (AVRational){fps_num, fps_den};
    ctx->thread_count = 0;
    char crfstr[16]; snprintf(crfstr, sizeof crfstr, "%d", crf);
    av_opt_set(ctx->priv_data, "crf", crfstr, 0);
    if (preset && preset[0]) av_opt_set(ctx->priv_data, "preset", preset, 0);
    AVDictionary *dict = NULL;
    if (opts && opts[0]) av_dict_parse_string(&dict, opts, "=", ",", 0);
    if (avcodec_open2(ctx, codec, &dict) < 0) { avcodec_free_context(&ctx); return -2; }
    av_dict_free(&dict);

    AVFrame *frame = av_frame_alloc();
    frame->format = ctx->pix_fmt; frame->width = w; frame->height = h;
    av_frame_get_buffer(frame, 0);
    AVPacket *pkt = av_packet_alloc();
    long off = 0, fsz = (long)w * h * 3 / 2;
    int err = 0;

    for (int i = 0; i <= nframes && !err; i++) {
        AVFrame *f = NULL;
        if (i < nframes) {
            av_frame_make_writable(frame);
            const uint8_t *src = yuv + i * fsz;
            for (int r = 0; r < h; r++)
                memcpy(frame->data[0] + (long)r * frame->linesize[0], src + (long)r * w, w);
            src += (long)w * h;
            for (int c = 1; c <= 2; c++) {
                for (int r = 0; r < h / 2; r++)
                    memcpy(frame->data[c] + (long)r * frame->linesize[c], src + (long)r * (w / 2), w / 2);
                src += (long)(w / 2) * (h / 2);
            }
            frame->pts = i;
            f = frame;
        }
        if (avcodec_send_frame(ctx, f) < 0) { err = -3; break; }
        while (avcodec_receive_packet(ctx, pkt) == 0) {
            if (off + pkt->size > out_cap) { err = -4; break; }
            memcpy(out + off, pkt->data, pkt->size);
            off += pkt->size;
            av_packet_unref(pkt);
        }
    }
    av_packet_free(&pkt);
    av_frame_free(&frame);
    avcodec_free_context(&ctx);
    return err ? err : off;
}
