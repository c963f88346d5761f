// Universal audio file decode/encode via the system FFmpeg libraries.
//
// This fills the role symphonia plays for the reference's AudioPlayer
// (ref generators/player.rs:170-260): open any container/codec (mp3, flac,
// ogg/vorbis, aac, wav, ...), decode fully up front, downmix to mono
// float32 at the file's native sample rate.  Resampling to the output
// device rate stays in Python (models/player.py), matching the reference's
// split where symphonia decodes and the player interpolates.
//
// The encoder exists so tests can fabricate compressed fixtures without any
// CLI tools, and doubles as an export path for recordings.
//
// C ABI only — loaded from Python via ctypes (no pybind11 in this image).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <cstring>
#include <string>
#include <vector>

namespace {

void set_err(char* err, int errlen, const std::string& msg) {
    if (err && errlen > 0) {
        std::snprintf(err, (size_t)errlen, "%s", msg.c_str());
    }
}

std::string av_errstr(int code) {
    char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
    av_strerror(code, buf, sizeof buf);
    return std::string(buf);
}

}  // namespace

extern "C" {

// Decode `path` to mono float32 at the file's native rate.  Returns a
// malloc'd buffer (free with decode_free) and fills *out_n / *out_rate,
// or returns nullptr with a message in `err`.
float* decode_audio_file(const char* path, long long* out_n, int* out_rate,
                         char* err, int errlen) {
    *out_n = 0;
    *out_rate = 0;

    AVFormatContext* fmt = nullptr;
    int rc = avformat_open_input(&fmt, path, nullptr, nullptr);
    if (rc < 0) {
        set_err(err, errlen, "open: " + av_errstr(rc));
        return nullptr;
    }
    rc = avformat_find_stream_info(fmt, nullptr);
    if (rc < 0) {
        avformat_close_input(&fmt);
        set_err(err, errlen, "stream info: " + av_errstr(rc));
        return nullptr;
    }
    const AVCodec* codec = nullptr;
    int sidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (sidx < 0 || !codec) {
        avformat_close_input(&fmt);
        set_err(err, errlen, "no decodable audio stream");
        return nullptr;
    }
    AVStream* st = fmt->streams[sidx];
    AVCodecContext* dec = avcodec_alloc_context3(codec);
    if (!dec) {
        avformat_close_input(&fmt);
        set_err(err, errlen, "codec context alloc failed");
        return nullptr;
    }
    avcodec_parameters_to_context(dec, st->codecpar);
    rc = avcodec_open2(dec, codec, nullptr);
    if (rc < 0) {
        avcodec_free_context(&dec);
        avformat_close_input(&fmt);
        set_err(err, errlen, "codec open: " + av_errstr(rc));
        return nullptr;
    }

    const int rate = dec->sample_rate;
    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    SwrContext* swr = nullptr;
    AVChannelLayout in_layout;
    if (dec->ch_layout.nb_channels > 0) {
        av_channel_layout_copy(&in_layout, &dec->ch_layout);
    } else {
        av_channel_layout_default(&in_layout, 1);
    }
    rc = swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, rate,
                             &in_layout, dec->sample_fmt, rate, 0, nullptr);
    av_channel_layout_uninit(&in_layout);
    if (rc < 0 || swr_init(swr) < 0) {
        if (swr) swr_free(&swr);
        avcodec_free_context(&dec);
        avformat_close_input(&fmt);
        set_err(err, errlen, "resampler init failed");
        return nullptr;
    }

    std::vector<float> pcm;
    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    std::vector<float> tmp;

    auto drain_frame = [&](AVFrame* f) {
        int max_out = f ? f->nb_samples + 256 : 4096;
        tmp.resize((size_t)max_out);
        uint8_t* outp = (uint8_t*)tmp.data();
        int got = swr_convert(swr, &outp, max_out,
                              f ? (const uint8_t**)f->extended_data : nullptr,
                              f ? f->nb_samples : 0);
        if (got > 0) pcm.insert(pcm.end(), tmp.begin(), tmp.begin() + got);
        return got;
    };

    bool eof = false;
    std::string read_err;
    while (!eof) {
        rc = av_read_frame(fmt, pkt);
        if (rc == AVERROR_EOF) {
            avcodec_send_packet(dec, nullptr);  // flush
            eof = true;
        } else if (rc < 0) {
            // A mid-file read error (corrupt/truncated container) is a
            // failed decode, not a short success: flush what the decoder
            // holds for accounting, then report the error.
            read_err = "read: " + av_errstr(rc);
            avcodec_send_packet(dec, nullptr);
            eof = true;
        } else {
            if (pkt->stream_index == sidx) avcodec_send_packet(dec, pkt);
            av_packet_unref(pkt);
        }
        while (avcodec_receive_frame(dec, frame) == 0) {
            drain_frame(frame);
        }
    }
    while (drain_frame(nullptr) > 0) {  // flush the resampler
    }

    av_frame_free(&frame);
    av_packet_free(&pkt);
    swr_free(&swr);
    avcodec_free_context(&dec);
    avformat_close_input(&fmt);

    if (!read_err.empty()) {
        set_err(err, errlen, read_err);
        return nullptr;
    }
    if (pcm.empty()) {
        set_err(err, errlen, "decoded zero samples");
        return nullptr;
    }
    float* out = (float*)std::malloc(pcm.size() * sizeof(float));
    if (!out) {
        set_err(err, errlen, "oom");
        return nullptr;
    }
    std::memcpy(out, pcm.data(), pcm.size() * sizeof(float));
    *out_n = (long long)pcm.size();
    *out_rate = rate;
    return out;
}

void decode_free(float* p) { std::free(p); }

// 1 if `path`'s extension maps to a known container with an available audio
// encoder (so encode_audio_file can succeed), else 0.  Lets callers reject
// an un-encodable recording target up front instead of at finalize time.
int encode_supported(const char* path) {
    const AVOutputFormat* of = av_guess_format(nullptr, path, nullptr);
    if (!of || of->audio_codec == AV_CODEC_ID_NONE) return 0;
    return avcodec_find_encoder(of->audio_codec) ? 1 : 0;
}

// Encode mono float32 `samples` to `path`; the container/codec is inferred
// from the extension (flac, ogg, wav, ...).  Returns 0 on success, -1 with
// a message in `err` otherwise.
int encode_audio_file(const char* path, const float* samples, long long n,
                      int rate, char* err, int errlen) {
    AVFormatContext* fmt = nullptr;
    int rc = avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
    if (rc < 0 || !fmt) {
        set_err(err, errlen, "no muxer for path");
        return -1;
    }
    enum AVCodecID cid = fmt->oformat->audio_codec;
    const AVCodec* codec = avcodec_find_encoder(cid);
    if (!codec) {
        avformat_free_context(fmt);
        set_err(err, errlen, "no encoder for container");
        return -1;
    }
    AVStream* st = avformat_new_stream(fmt, nullptr);
    AVCodecContext* enc = st ? avcodec_alloc_context3(codec) : nullptr;
    if (!enc) {
        avformat_free_context(fmt);
        set_err(err, errlen, "encoder context alloc failed");
        return -1;
    }
    enc->sample_rate = rate;
    av_channel_layout_default(&enc->ch_layout, 1);
    // Prefer the highest-precision sample format the encoder offers so a
    // float32 source survives as faithfully as the codec allows (flac
    // defaults to s16 otherwise).
    enc->sample_fmt = AV_SAMPLE_FMT_FLT;
    if (codec->sample_fmts) {
        static const enum AVSampleFormat pref[] = {
            AV_SAMPLE_FMT_FLT, AV_SAMPLE_FMT_FLTP, AV_SAMPLE_FMT_DBL,
            AV_SAMPLE_FMT_DBLP, AV_SAMPLE_FMT_S32, AV_SAMPLE_FMT_S32P,
            AV_SAMPLE_FMT_S16, AV_SAMPLE_FMT_S16P};
        enc->sample_fmt = codec->sample_fmts[0];
        for (enum AVSampleFormat want : pref) {
            bool found = false;
            for (const enum AVSampleFormat* f = codec->sample_fmts;
                 *f != AV_SAMPLE_FMT_NONE; ++f) {
                if (*f == want) { found = true; break; }
            }
            if (found) { enc->sample_fmt = want; break; }
        }
    }
    enc->time_base = AVRational{1, rate};
    // Allow native encoders marked experimental (e.g. vorbis).
    enc->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER) {
        enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    }
    rc = avcodec_open2(enc, codec, nullptr);
    if (rc < 0) {
        avcodec_free_context(&enc);
        avformat_free_context(fmt);
        set_err(err, errlen, "encoder open: " + av_errstr(rc));
        return -1;
    }
    avcodec_parameters_from_context(st->codecpar, enc);
    st->time_base = enc->time_base;

    if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
        rc = avio_open(&fmt->pb, path, AVIO_FLAG_WRITE);
        if (rc < 0) {
            avcodec_free_context(&enc);
            avformat_free_context(fmt);
            set_err(err, errlen, "file open: " + av_errstr(rc));
            return -1;
        }
    }
    rc = avformat_write_header(fmt, nullptr);
    if (rc < 0) {
        if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
        avcodec_free_context(&enc);
        avformat_free_context(fmt);
        set_err(err, errlen, "write header: " + av_errstr(rc));
        return -1;
    }

    // Convert from packed FLT mono to whatever the encoder wants.
    SwrContext* swr = nullptr;
    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    rc = swr_alloc_set_opts2(&swr, &enc->ch_layout, enc->sample_fmt, rate,
                             &mono, AV_SAMPLE_FMT_FLT, rate, 0, nullptr);
    if (rc < 0 || swr_init(swr) < 0) {
        if (swr) swr_free(&swr);
        if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
        avcodec_free_context(&enc);
        avformat_free_context(fmt);
        set_err(err, errlen, "resampler init failed");
        return -1;
    }

    const int chunk = enc->frame_size > 0 ? enc->frame_size : 4096;
    AVPacket* pkt = av_packet_alloc();
    long long pos = 0;
    long long pts = 0;
    bool flushed = false;
    std::string encerr;

    auto pump_packets = [&]() -> int {
        while (true) {
            int r = avcodec_receive_packet(enc, pkt);
            if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
            if (r < 0) {
                encerr = "receive packet: " + av_errstr(r);
                return -1;
            }
            av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
            pkt->stream_index = st->index;
            r = av_interleaved_write_frame(fmt, pkt);
            if (r < 0) {
                encerr = "write frame: " + av_errstr(r);
                return -1;
            }
        }
    };

    int status = 0;
    while (!flushed && status == 0) {
        if (pos < n) {
            int take = (int)std::min((long long)chunk, n - pos);
            AVFrame* f = av_frame_alloc();
            if (!f) { encerr = "frame alloc failed"; status = -1; break; }
            f->nb_samples = take;
            av_channel_layout_copy(&f->ch_layout, &enc->ch_layout);
            f->format = enc->sample_fmt;
            f->sample_rate = rate;
            if (av_frame_get_buffer(f, 0) < 0) {
                av_frame_free(&f);
                encerr = "frame buffer alloc failed";
                status = -1;
                break;
            }
            const uint8_t* inp = (const uint8_t*)(samples + pos);
            swr_convert(swr, f->extended_data, take, &inp, take);
            f->pts = pts;
            pts += take;
            pos += take;
            rc = avcodec_send_frame(enc, f);
            av_frame_free(&f);
            if (rc < 0) {
                encerr = "send frame: " + av_errstr(rc);
                status = -1;
            }
        } else {
            avcodec_send_frame(enc, nullptr);
            flushed = true;
        }
        if (status == 0) status = pump_packets();
    }

    av_packet_free(&pkt);
    swr_free(&swr);
    if (status == 0) {
        av_write_trailer(fmt);
    }
    if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
    avcodec_free_context(&enc);
    avformat_free_context(fmt);
    if (status != 0) set_err(err, errlen, encerr);
    return status;
}

}  // extern "C"
