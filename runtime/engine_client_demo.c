/* Demo + smoke test for the C embedding client: synthesize an A3 tone in
 * C, push it through the engine's virtual input, run the tuner, and print
 * the polled JSON.  Exits 0 iff the tuner heard A3. */

#include "engine_client.h"

#include <math.h>
#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

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
    const double sr = 48000.0;
    const size_t n = (size_t)(1.2 * sr);
    float* tone = malloc(n * sizeof(float));
    for (size_t i = 0; i < n; i++) {
        double t = (double)i / sr;
        double v = 0.0;
        for (int h = 1; h <= 6; h++)
            v += sin(2.0 * M_PI * 220.0 * h * t) / (double)h;
        tone[i] = (float)(0.3 * v / 2.45);
    }
    if (engine_client_push_audio(c, tone, n) != 0) {
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
    engine_client_close(c);

    if (!ok) { fprintf(stderr, "expected A3 + Already active\n"); return 1; }
    return 0;
}
