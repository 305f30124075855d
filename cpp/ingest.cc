// missm_tpu native ingest: image/depth/audio/video decode.
//
// Owns the decode hot path the reference delegated to native Python deps
// (decord, OpenCV, PIL, torchaudio/soundfile — SURVEY §2.3):
//   - JPEG (libjpeg) and PNG (libpng) -> RGB8
//   - 16-bit PNG -> raw u16 (depth maps, cv2.IMREAD_UNCHANGED equivalent)
//   - RIFF/WAV PCM 8/16/32 + float32 -> float32 channel 0 in [-1, 1]
//   - video containers via FFmpeg (libavformat/avcodec/swscale), frames
//     sampled at linspace(0, n-1, num_frames) like the reference's decord/
//     opencv backends (video/processing_video.py:92,100)
//
// C ABI only; buffers are malloc'd here and released via mi_free.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libswscale/swscale.h>
#include <libavutil/imgutils.h>
}

extern "C" {

void mi_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

static int decode_jpeg(FILE* f, uint8_t** data, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int H = cinfo.output_height, W = cinfo.output_width;
  uint8_t* out = static_cast<uint8_t*>(malloc((size_t)H * W * 3));
  if (!out) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *data = out;
  *h = H;
  *w = W;
  return 0;
}

// ---------------------------------------------------------------------------
// PNG (8-bit RGB and 16-bit gray)
// ---------------------------------------------------------------------------

static int decode_png_rgb(FILE* f, uint8_t** data, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  const int H = png_get_image_height(png, info);
  const int W = png_get_image_width(png, info);
  uint8_t* out = static_cast<uint8_t*>(malloc((size_t)H * W * 3));
  std::vector<png_bytep> rows(H);
  for (int y = 0; y < H; ++y) rows[y] = out + (size_t)y * W * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  *data = out;
  *h = H;
  *w = W;
  return 0;
}

static int decode_png_u16(FILE* f, uint16_t** data, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (color != PNG_COLOR_TYPE_GRAY) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  if (bit_depth < 16) png_set_expand_gray_1_2_4_to_8(png);
  // keep 16-bit samples big-endian -> swap to host
  if (bit_depth == 16) png_set_swap(png);
  png_read_update_info(png, info);
  const int H = png_get_image_height(png, info);
  const int W = png_get_image_width(png, info);
  uint16_t* out = static_cast<uint16_t*>(malloc((size_t)H * W * 2));
  if (bit_depth == 16) {
    std::vector<png_bytep> rows(H);
    for (int y = 0; y < H; ++y)
      rows[y] = reinterpret_cast<png_bytep>(out + (size_t)y * W);
    png_read_image(png, rows.data());
  } else {
    std::vector<uint8_t> buf((size_t)H * W);
    std::vector<png_bytep> rows(H);
    for (int y = 0; y < H; ++y) rows[y] = buf.data() + (size_t)y * W;
    png_read_image(png, rows.data());
    for (size_t i = 0; i < buf.size(); ++i) out[i] = buf[i];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  *data = out;
  *h = H;
  *w = W;
  return 0;
}

int mi_decode_image(const char* path, uint8_t** data, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  int rc = -1;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(f, data, h, w);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    rc = decode_png_rgb(f, data, h, w);
  }
  fclose(f);
  return rc;
}

int mi_decode_depth(const char* path, uint16_t** data, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  int rc = -1;
  if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    rc = decode_png_u16(f, data, h, w);
  }
  fclose(f);
  return rc;
}

// ---------------------------------------------------------------------------
// WAV (RIFF PCM / IEEE float)
// ---------------------------------------------------------------------------

int mi_read_audio(const char* path, float** data, long* n, int* sr) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) ||
      fread(&riff_size, 4, 1, f) != 1 || fread(wave, 1, 4, f) != 4 ||
      memcmp(wave, "WAVE", 4)) {
    fclose(f);
    return -1;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  std::vector<uint8_t> payload;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (!memcmp(id, "fmt ", 4)) {
      uint8_t buf[16];
      if (size < 16 || fread(buf, 1, 16, f) != 16) break;
      memcpy(&fmt, buf, 2);
      memcpy(&channels, buf + 2, 2);
      memcpy(&rate, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
    } else if (!memcmp(id, "data", 4)) {
      payload.resize(size);
      if (fread(payload.data(), 1, size, f) != size) payload.resize(0);
      break;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (payload.empty() || channels == 0 || rate == 0) return -1;

  const size_t bytes_per = bits / 8;
  const size_t n_frames = payload.size() / (bytes_per * channels);
  float* out = static_cast<float*>(malloc(n_frames * sizeof(float)));
  const uint8_t* p = payload.data();
  for (size_t i = 0; i < n_frames; ++i) {
    const uint8_t* s = p + i * bytes_per * channels;  // channel 0
    float v = 0.f;
    if (fmt == 3 && bits == 32) {
      memcpy(&v, s, 4);
    } else if (fmt == 1 && bits == 16) {
      int16_t x;
      memcpy(&x, s, 2);
      v = x / 32768.0f;
    } else if (fmt == 1 && bits == 32) {
      int32_t x;
      memcpy(&x, s, 4);
      v = x / 2147483648.0f;
    } else if (fmt == 1 && bits == 8) {
      v = (s[0] - 128) / 128.0f;
    } else {
      free(out);
      return -1;
    }
    out[i] = v;
  }
  *data = out;
  *n = (long)n_frames;
  *sr = (int)rate;
  return 0;
}

// ---------------------------------------------------------------------------
// Audio stream decode from any container (mp4/avi/...): mono float32 at the
// stream's native rate — the in-process replacement for the reference's
// `ffmpeg -i x.mp4 -ac 1 -ar 16000 x.wav` (convert_to_wav.py:10-12);
// channel downmix is an average, resampling happens host-side in Python.
// ---------------------------------------------------------------------------

static float sample_to_float(const AVFrame* fr, int fmt, int ch, int i) {
  switch (fmt) {
    case AV_SAMPLE_FMT_FLT:
      return reinterpret_cast<const float*>(fr->data[0])[i * fr->ch_layout.nb_channels + ch];
    case AV_SAMPLE_FMT_FLTP:
      return reinterpret_cast<const float*>(fr->data[ch])[i];
    case AV_SAMPLE_FMT_S16:
      return reinterpret_cast<const int16_t*>(fr->data[0])[i * fr->ch_layout.nb_channels + ch] / 32768.0f;
    case AV_SAMPLE_FMT_S16P:
      return reinterpret_cast<const int16_t*>(fr->data[ch])[i] / 32768.0f;
    case AV_SAMPLE_FMT_S32:
      return reinterpret_cast<const int32_t*>(fr->data[0])[i * fr->ch_layout.nb_channels + ch] / 2147483648.0f;
    case AV_SAMPLE_FMT_S32P:
      return reinterpret_cast<const int32_t*>(fr->data[ch])[i] / 2147483648.0f;
    case AV_SAMPLE_FMT_DBL:
      return (float)reinterpret_cast<const double*>(fr->data[0])[i * fr->ch_layout.nb_channels + ch];
    case AV_SAMPLE_FMT_DBLP:
      return (float)reinterpret_cast<const double*>(fr->data[ch])[i];
    case AV_SAMPLE_FMT_U8:
      return (reinterpret_cast<const uint8_t*>(fr->data[0])[i * fr->ch_layout.nb_channels + ch] - 128) / 128.0f;
    case AV_SAMPLE_FMT_U8P:
      return (reinterpret_cast<const uint8_t*>(fr->data[ch])[i] - 128) / 128.0f;
    default:
      return 0.f;
  }
}

int mi_decode_media_audio(const char* path, float** data, long* n,
                          int* sr_out) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -1;
  }
  int as = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (as < 0) {
    avformat_close_input(&fmt);
    return -1;
  }
  AVStream* stream = fmt->streams[as];
  const AVCodec* codec = avcodec_find_decoder(stream->codecpar->codec_id);
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, stream->codecpar);
  if (!codec || avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -1;
  }

  std::vector<float> samples;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();

  auto consume = [&](AVFrame* fr) {
    const int nch = fr->ch_layout.nb_channels;
    const int fmt_s = fr->format;
    for (int i = 0; i < fr->nb_samples; ++i) {
      float acc = 0.f;
      for (int c = 0; c < nch; ++c) acc += sample_to_float(fr, fmt_s, c, i);
      samples.push_back(acc / (nch > 0 ? nch : 1));
    }
  };

  while (av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == as) {
      if (avcodec_send_packet(ctx, pkt) == 0) {
        while (avcodec_receive_frame(ctx, frame) == 0) consume(frame);
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(ctx, nullptr);
  while (avcodec_receive_frame(ctx, frame) == 0) consume(frame);

  const int sr = ctx->sample_rate;
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);

  if (samples.empty() || sr <= 0) return -1;
  float* out = static_cast<float*>(malloc(samples.size() * sizeof(float)));
  memcpy(out, samples.data(), samples.size() * sizeof(float));
  *data = out;
  *n = (long)samples.size();
  *sr_out = sr;
  return 0;
}

// ---------------------------------------------------------------------------
// Video via FFmpeg: linspace frame sampling, RGB24 output
// ---------------------------------------------------------------------------

static int64_t count_stream_frames(AVFormatContext* fmt, int vs) {
  // frame count: header if available, else a packet-count pass (1 pkt ~ 1
  // frame for the codecs in scope), like decord's len(VideoReader)
  int64_t total = fmt->streams[vs]->nb_frames;
  if (total <= 0) {
    AVPacket pkt;
    total = 0;
    while (av_read_frame(fmt, &pkt) >= 0) {
      if (pkt.stream_index == vs) ++total;
      av_packet_unref(&pkt);
    }
    av_seek_frame(fmt, vs, 0, AVSEEK_FLAG_BACKWARD);
  }
  return total;
}

// Total frame count + average fps — the metadata the pytorchvideo-backend
// sampling path needs host-side (EncodedVideo.duration equivalent).
int mi_video_frame_count(const char* path, int64_t* total_out,
                         double* fps_out) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -1;
  }
  int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vs < 0) {
    avformat_close_input(&fmt);
    return -1;
  }
  int64_t total = count_stream_frames(fmt, vs);
  AVRational r = fmt->streams[vs]->avg_frame_rate;
  *fps_out = (r.den > 0) ? av_q2d(r) : 0.0;
  avformat_close_input(&fmt);
  if (total <= 0) return -1;
  *total_out = total;
  return 0;
}

// Decode the frames at the given SORTED (duplicates allowed) decode-order
// indices. Sequential decode, no seeking — matches decord.get_batch
// semantics for the containers in scope.
int mi_decode_video_indices(const char* path, const int64_t* want_idx,
                            int num_frames, uint8_t** data, int* t_out,
                            int* h_out, int* w_out) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -1;
  }
  int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vs < 0) {
    avformat_close_input(&fmt);
    return -1;
  }
  AVStream* stream = fmt->streams[vs];
  std::vector<int64_t> want(want_idx, want_idx + num_frames);

  const AVCodec* codec = avcodec_find_decoder(stream->codecpar->codec_id);
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, stream->codecpar);
  if (!codec || avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -1;
  }

  const int W = ctx->width, H = ctx->height;
  uint8_t* out =
      static_cast<uint8_t*>(malloc((size_t)num_frames * H * W * 3));
  SwsContext* sws =
      sws_getContext(W, H, ctx->pix_fmt, W, H, AV_PIX_FMT_RGB24,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t idx = 0;
  int next_want = 0;
  int rc = 0;

  auto deliver = [&](AVFrame* fr) {
    while (next_want < num_frames && want[next_want] == idx) {
      uint8_t* dst[1] = {out + (size_t)next_want * H * W * 3};
      int dst_stride[1] = {W * 3};
      sws_scale(sws, fr->data, fr->linesize, 0, H, dst, dst_stride);
      ++next_want;
    }
    ++idx;
  };

  // Intra-only codecs (MJPEG, ProRes, raw): every packet decodes
  // independently, so unwanted packets can skip the decoder entirely —
  // sampling 8 of 60 frames costs 8 decodes, not 60. Inter-coded streams
  // must decode every frame for reference chains.
  const AVCodecDescriptor* desc =
      avcodec_descriptor_get(stream->codecpar->codec_id);
  const bool intra_only = desc && (desc->props & AV_CODEC_PROP_INTRA_ONLY);
  int64_t pkt_idx = 0;  // frame index by packet position (intra-only path)

  while (next_want < num_frames && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == vs) {
      if (intra_only) {
        const bool wanted = next_want < num_frames &&
                            want[next_want] == pkt_idx;
        if (wanted) {
          idx = pkt_idx;  // decoder emits exactly the frames we send
          if (avcodec_send_packet(ctx, pkt) == 0) {
            while (avcodec_receive_frame(ctx, frame) == 0) deliver(frame);
          }
        }
        ++pkt_idx;
      } else if (avcodec_send_packet(ctx, pkt) == 0) {
        while (avcodec_receive_frame(ctx, frame) == 0) deliver(frame);
      }
    }
    av_packet_unref(pkt);
  }
  // flush decoder
  avcodec_send_packet(ctx, nullptr);
  while (next_want < num_frames && avcodec_receive_frame(ctx, frame) == 0)
    deliver(frame);

  if (next_want < num_frames) {
    // fewer decodable frames than the packet count suggested: repeat last
    for (; next_want < num_frames; ++next_want) {
      if (next_want == 0) {
        rc = -1;
        break;
      }
      memcpy(out + (size_t)next_want * H * W * 3,
             out + (size_t)(next_want - 1) * H * W * 3, (size_t)H * W * 3);
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  sws_freeContext(sws);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);

  if (rc != 0) {
    free(out);
    return rc;
  }
  *data = out;
  *t_out = num_frames;
  *h_out = H;
  *w_out = W;
  return 0;
}

// decord/opencv-backend sampling: linspace(0, total-1, num_frames) rounded
// like np.linspace(..., dtype=int) (reference video/processing_video.py:92,100)
int mi_decode_video(const char* path, int num_frames, uint8_t** data,
                    int* t_out, int* h_out, int* w_out) {
  int64_t total;
  double fps;
  if (mi_video_frame_count(path, &total, &fps) != 0) return -1;
  std::vector<int64_t> want(num_frames);
  for (int i = 0; i < num_frames; ++i) {
    double v = (num_frames == 1)
                   ? 0.0
                   : (double)i * (double)(total - 1) / (num_frames - 1);
    want[i] = (int64_t)v;  // truncation == numpy int cast
  }
  return mi_decode_video_indices(path, want.data(), num_frames, data, t_out,
                                 h_out, w_out);
}

// ---------------------------------------------------------------------------
// Banded separable resample (host transform path)
//
// The Python side builds the SAME short-side-resize+crop(+flip) weight
// matrices it feeds the on-device matmul resampler, then strips each row to
// its non-zero band (bicubic/bilinear kernels have compact support), so this
// computes bit-equivalent math (modulo f32 summation order) at
// O(out * taps) instead of a dense matmul — ~1 ms for 500x640 -> 224x224x3
// on one core, vs a ~290 ms synchronous device round-trip through the
// tunnel per sample (the round-1 input-path defect).
// ---------------------------------------------------------------------------

// img: [h, w, c] uint8 (HWC).
// H band: wh [th, tapsh] weights, loh [th] source-row starts.
// W band: ww [tw, tapsw], low [tw].
// mean/stdv: per-channel, applied as ((x/255) - mean) / stdv.
// out: [c, th, tw] float32 (CHW).
int mi_resample_u8_norm(const uint8_t* img, int h, int w, int c,
                        const float* wh, const int* loh, int th, int tapsh,
                        const float* ww, const int* low, int tw, int tapsw,
                        const float* mean, const float* stdv, float* out) {
  if (!img || !wh || !ww || !out || c <= 0) return -1;
  const float inv255 = 1.0f / 255.0f;
  std::vector<float> tmp((size_t)th * w * c, 0.0f);  // [th, w, c]
  for (int o = 0; o < th; ++o) {
    float* dst = tmp.data() + (size_t)o * w * c;
    for (int t = 0; t < tapsh; ++t) {
      const float wv = wh[(size_t)o * tapsh + t];
      if (wv == 0.0f) continue;
      const int src = loh[o] + t;
      if (src < 0 || src >= h) return -2;
      const uint8_t* row = img + (size_t)src * w * c;
      const int n = w * c;
      for (int i = 0; i < n; ++i) dst[i] += wv * (float)row[i];
    }
  }
  for (int ch = 0; ch < c; ++ch) {
    const float m = mean[ch] * 255.0f;  // fold /255 into one scale+shift
    const float inv_sd = inv255 / stdv[ch];
    for (int o = 0; o < th; ++o) {
      const float* trow = tmp.data() + (size_t)o * w * c;
      float* orow = out + ((size_t)ch * th + o) * tw;
      for (int p = 0; p < tw; ++p) {
        float acc = 0.0f;
        const float* wrow = ww + (size_t)p * tapsw;
        const int lo = low[p];
        for (int t = 0; t < tapsw; ++t) {
          const int src = lo + t;
          if (src < 0 || src >= w) return -2;
          acc += wrow[t] * trow[(size_t)src * c + ch];
        }
        orow[p] = (acc - m) * inv_sd;
      }
    }
  }
  return 0;
}

// uint8-output variant (the --uint8_upload tunnel-byte saver): same banded
// resample+crop, but the output stays [c, th, tw] uint8 (rounded, clamped —
// bicubic can overshoot [0,255]) and normalization moves to the device,
// fused into the tower's input cast. Quantizing AFTER the resize mirrors
// PIL's uint8 Resize in the reference image pipeline
// (image/processing_image.py ToTensor after Resize) and bounds the error
// at 0.5/255 of dynamic range — below bf16 rounding of the f32 path.
int mi_resample_u8_u8(const uint8_t* img, int h, int w, int c,
                      const float* wh, const int* loh, int th, int tapsh,
                      const float* ww, const int* low, int tw, int tapsw,
                      uint8_t* out) {
  if (!img || !wh || !ww || !out || c <= 0) return -1;
  std::vector<float> tmp((size_t)th * w * c, 0.0f);  // [th, w, c]
  for (int o = 0; o < th; ++o) {
    float* dst = tmp.data() + (size_t)o * w * c;
    for (int t = 0; t < tapsh; ++t) {
      const float wv = wh[(size_t)o * tapsh + t];
      if (wv == 0.0f) continue;
      const int src = loh[o] + t;
      if (src < 0 || src >= h) return -2;
      const uint8_t* row = img + (size_t)src * w * c;
      const int n = w * c;
      for (int i = 0; i < n; ++i) dst[i] += wv * (float)row[i];
    }
  }
  for (int ch = 0; ch < c; ++ch) {
    for (int o = 0; o < th; ++o) {
      const float* trow = tmp.data() + (size_t)o * w * c;
      uint8_t* orow = out + ((size_t)ch * th + o) * tw;
      for (int p = 0; p < tw; ++p) {
        float acc = 0.0f;
        const float* wrow = ww + (size_t)p * tapsw;
        const int lo = low[p];
        for (int t = 0; t < tapsw; ++t) {
          const int src = lo + t;
          if (src < 0 || src >= w) return -2;
          acc += wrow[t] * trow[(size_t)src * c + ch];
        }
        const float r = acc + 0.5f;
        orow[p] = (uint8_t)(r < 0.0f ? 0.0f : (r > 255.0f ? 255.0f : r));
      }
    }
  }
  return 0;
}

// f32 single-plane variant (depth path; normalize happens in Python).
int mi_resample_f32(const float* img, int h, int w, const float* wh,
                    const int* loh, int th, int tapsh, const float* ww,
                    const int* low, int tw, int tapsw, float* out) {
  if (!img || !wh || !ww || !out) return -1;
  std::vector<float> tmp((size_t)th * w, 0.0f);
  for (int o = 0; o < th; ++o) {
    float* dst = tmp.data() + (size_t)o * w;
    for (int t = 0; t < tapsh; ++t) {
      const float wv = wh[(size_t)o * tapsh + t];
      if (wv == 0.0f) continue;
      const int src = loh[o] + t;
      if (src < 0 || src >= h) return -2;
      const float* row = img + (size_t)src * w;
      for (int i = 0; i < w; ++i) dst[i] += wv * row[i];
    }
  }
  for (int o = 0; o < th; ++o) {
    const float* trow = tmp.data() + (size_t)o * w;
    float* orow = out + (size_t)o * tw;
    for (int p = 0; p < tw; ++p) {
      float acc = 0.0f;
      const float* wrow = ww + (size_t)p * tapsw;
      const int lo = low[p];
      for (int t = 0; t < tapsw; ++t) {
        const int src = lo + t;
        if (src < 0 || src >= w) return -2;
        acc += wrow[t] * trow[src];
      }
      orow[p] = acc;
    }
  }
  return 0;
}

}  // extern "C"
