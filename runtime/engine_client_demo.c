/* Demo + smoke test for the C embedding client: synthesize an A3 tone in
 * C, push it through the engine's virtual input, run the tuner, and print
 * the polled JSON; then open a SECOND session on the same server, pool
 * both (each slot wave of both engines = one batched device dispatch,
 * api/pool.py), and verify each session's tuner hears its own tone.
 * Exits 0 iff the solo flow heard A3 and the pooled flow heard A3 + E4. */

#include "engine_client.h"

#include <math.h>
#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* seconds of `hz` with 6 sawtooth-weighted harmonics at 48 kHz. */
static float* make_tone(double hz, double seconds, size_t* n_out) {
    const double sr = 48000.0;
    size_t n = (size_t)(seconds * sr);
    float* tone = malloc(n * sizeof(float));
    if (!tone) return NULL;
    for (size_t i = 0; i < n; i++) {
        double t = (double)i / sr;
        double v = 0.0;
        for (int h = 1; h <= 6; h++)
            v += sin(2.0 * M_PI * hz * h * t) / (double)h;
        tone[i] = (float)(0.3 * v / 2.45);
    }
    *n_out = n;
    return tone;
}

int main(int argc, char** argv) {
    const char* repo = argc > 1 ? argv[1] : ".";
    EngineClient* c = engine_client_spawn(NULL, repo);
    if (!c) { fprintf(stderr, "spawn failed\n"); return 1; }

    char out[4096];
    if (engine_client_call(c, "ping", NULL, out, sizeof out) != 0) {
        fprintf(stderr, "ping: %s\n", engine_client_last_error(c));
        return 1;
    }
    printf("ping -> %s\n", out);

    /* 1.2 s of A3 (220 Hz) with a few harmonics at 48 kHz. */
    size_t n = 0;
    float* tone = make_tone(220.0, 1.2, &n);
    if (!tone || engine_client_push_audio(c, tone, n) != 0) {
        fprintf(stderr, "push: %s\n", engine_client_last_error(c));
        return 1;
    }
    free(tone);

    char poll[4096];
    if (engine_client_call(c, "start_tuner", NULL, out, sizeof out) != 0 ||
        engine_client_call(c, "advance", "[1.0]", out, sizeof out) != 0 ||
        engine_client_call(c, "poll_output", NULL, poll, sizeof poll) != 0) {
        fprintf(stderr, "tuner flow: %s\n", engine_client_last_error(c));
        return 1;
    }
    printf("poll_output -> %s\n", poll);

    /* Error path: double-start must surface the uniffi-shaped message. */
    if (engine_client_call(c, "start_tuner", NULL, out, sizeof out) == 0) {
        fprintf(stderr, "double start unexpectedly succeeded\n");
        return 1;
    }
    printf("double start -> error: %s\n", engine_client_last_error(c));

    int ok = strstr(poll, "A3") != NULL &&
             strstr(engine_client_last_error(c), "Already active") != NULL;
    if (!ok) {
        fprintf(stderr, "expected A3 + Already active\n");
        engine_client_close(c);
        return 1;
    }

    /* ── Multi-session: a second engine on the same server, both pooled
     * so each slot wave runs as ONE batched device dispatch. ── */
    int sid = engine_client_session_create(c, "{}");
    if (sid < 1) {
        fprintf(stderr, "session.create: %s\n", engine_client_last_error(c));
        return 1;
    }
    printf("session.create -> %d\n", sid);

    /* Fresh audio for both sessions: A3 again into session 0, E4 into the
     * new one. */
    tone = make_tone(220.0, 1.6, &n);
    if (!tone || engine_client_push_audio_session(c, 0, tone, n) != 0) {
        fprintf(stderr, "push s0: %s\n", engine_client_last_error(c));
        return 1;
    }
    free(tone);
    tone = make_tone(330.0, 1.6, &n);
    if (!tone || engine_client_push_audio_session(c, sid, tone, n) != 0) {
        fprintf(stderr, "push s%d: %s\n", sid, engine_client_last_error(c));
        return 1;
    }
    free(tone);

    /* Both live flows (tuner + onset) per session: that is what makes a
     * slot wave fused-eligible, so the pool batches both engines into one
     * device dispatch per wave (api/pool.py step_wave). */
    if (engine_client_call_session(c, sid, "start_tuner", NULL,
                                   out, sizeof out) != 0 ||
        engine_client_call_session(c, 0, "start_onset_detection", NULL,
                                   out, sizeof out) != 0 ||
        engine_client_call_session(c, sid, "start_onset_detection", NULL,
                                   out, sizeof out) != 0) {
        fprintf(stderr, "start flows s%d: %s\n", sid,
                engine_client_last_error(c));
        return 1;
    }
    int k = engine_client_pool_join(
        c, "{\"pipeline_depth\": 1, \"aggregate_slots\": 2}");
    if (k != 2) {
        fprintf(stderr, "pool.join: k=%d %s\n", k,
                engine_client_last_error(c));
        return 1;
    }
    printf("pool.join -> k=%d\n", k);

    /* One advance drives BOTH sessions in lockstep (pooled waves). */
    char poll0[4096], poll1[4096], stats[256];
    if (engine_client_call(c, "advance", "[1.2]", out, sizeof out) != 0 ||
        engine_client_call(c, "pool.flush", NULL, out, sizeof out) != 0 ||
        engine_client_call_session(c, 0, "poll_output", NULL,
                                   poll0, sizeof poll0) != 0 ||
        engine_client_call_session(c, sid, "poll_output", NULL,
                                   poll1, sizeof poll1) != 0 ||
        engine_client_call(c, "pool.stats", NULL, stats, sizeof stats) != 0) {
        fprintf(stderr, "pooled flow: %s\n", engine_client_last_error(c));
        return 1;
    }
    printf("pooled poll s0 -> %s\n", poll0);
    printf("pooled poll s%d -> %s\n", sid, poll1);
    printf("pool.stats -> %s\n", stats);

    /* waves > 0 proves the sessions' slots really ran as batched pool
     * dispatches (not per-engine fallbacks). */
    int waves = -1;
    const char* wp = strstr(stats, "\"waves\":");
    if (wp) waves = atoi(wp + 8);
    ok = strstr(poll0, "A3") != NULL && strstr(poll1, "E4") != NULL &&
         strstr(stats, "\"k\": 2") != NULL && waves > 0;
    engine_client_close(c);

    if (!ok) {
        fprintf(stderr, "expected pooled A3 (s0) + E4 (s%d) + k=2\n", sid);
        return 1;
    }
    return 0;
}
