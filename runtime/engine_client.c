/* See engine_client.h.  POSIX-only (fork/pipe), like the reference's
 * desktop targets. */

#define _POSIX_C_SOURCE 200809L

#include "engine_client.h"

#include <errno.h>
#include <signal.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>

struct EngineClient {
    pid_t pid;
    FILE* to_child;    /* our writes → child stdin  */
    FILE* from_child;  /* child stdout → our reads  */
    int next_id;
    char err[512];
};

static void set_err(EngineClient* c, const char* msg) {
    snprintf(c->err, sizeof c->err, "%s", msg);
}

EngineClient* engine_client_spawn(const char* python_exe,
                                  const char* repo_root) {
    int in_pipe[2], out_pipe[2];
    if (pipe(in_pipe) != 0 || pipe(out_pipe) != 0) return NULL;

    pid_t pid = fork();
    if (pid < 0) return NULL;
    if (pid == 0) {
        /* child: stdin ← in_pipe, stdout → out_pipe, stderr inherited */
        dup2(in_pipe[0], 0);
        dup2(out_pipe[1], 1);
        close(in_pipe[0]); close(in_pipe[1]);
        close(out_pipe[0]); close(out_pipe[1]);
        if (repo_root && *repo_root) {
            /* Prepend; clobbering PYTHONPATH can drop site hooks the
             * deployment relies on (e.g. backend plugin registration). */
            const char* old = getenv("PYTHONPATH");
            if (old && *old) {
                char buf[4096];
                snprintf(buf, sizeof buf, "%s:%s", repo_root, old);
                setenv("PYTHONPATH", buf, 1);
            } else {
                setenv("PYTHONPATH", repo_root, 1);
            }
        }
        const char* exe = (python_exe && *python_exe) ? python_exe
                                                      : "python3";
        execlp(exe, exe, "-m", "audio_analyzer_rs_tpu.api.rpc",
               (char*)NULL);
        _exit(127);
    }
    close(in_pipe[0]);
    close(out_pipe[1]);

    EngineClient* c = calloc(1, sizeof *c);
    c->pid = pid;
    c->to_child = fdopen(in_pipe[1], "w");
    c->from_child = fdopen(out_pipe[0], "r");
    c->next_id = 1;
    if (!c->to_child || !c->from_child) {
        engine_client_close(c);
        return NULL;
    }
    return c;
}

/* Minimal scan: given a full response line, extract the "result" (or
 * "error") value as raw JSON.  The server emits flat, predictable lines
 * {"id": N, "result": ...} / {"id": N, "error": "..."} with the payload
 * last, so slicing from the key to the closing brace is sound. */
static int extract_value(const char* line, const char* key,
                         char* out, size_t out_len) {
    char pat[32];
    snprintf(pat, sizeof pat, "\"%s\": ", key);
    const char* p = strstr(line, pat);
    if (!p) return -1;
    p += strlen(pat);
    size_t n = strlen(p);
    while (n > 0 && (p[n - 1] == '\n' || p[n - 1] == '\r')) n--;
    if (n > 0 && p[n - 1] == '}') n--;   /* trailing brace of the envelope */
    if (n >= out_len) n = out_len - 1;
    memcpy(out, p, n);
    out[n] = '\0';
    return 0;
}

int engine_client_call(EngineClient* c, const char* method,
                       const char* params_json,
                       char* out, size_t out_len) {
    if (!c || !method) return -1;
    if (out && out_len) out[0] = '\0';
    if (fprintf(c->to_child, "{\"id\": %d, \"method\": \"%s\", "
                             "\"params\": %s}\n",
                c->next_id++, method,
                (params_json && *params_json) ? params_json : "[]") < 0
        || fflush(c->to_child) != 0) {
        set_err(c, "write to engine failed");
        return -1;
    }
    char line[1 << 16];
    if (!fgets(line, sizeof line, c->from_child)) {
        set_err(c, "engine closed the pipe");
        return -1;
    }
    if (strstr(line, "\"error\"")) {
        extract_value(line, "error", c->err, sizeof c->err);
        return -1;
    }
    if (out && out_len &&
        extract_value(line, "result", out, out_len) != 0) {
        set_err(c, "malformed response");
        return -1;
    }
    return 0;
}

static const char B64[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

int engine_client_push_audio(EngineClient* c, const float* samples,
                             size_t n) {
    const unsigned char* bytes = (const unsigned char*)samples;
    size_t nbytes = n * sizeof(float);
    size_t b64len = 4 * ((nbytes + 2) / 3);
    /* params: ["<base64>"] */
    char* params = malloc(b64len + 8);
    if (!params) { set_err(c, "oom"); return -1; }
    char* q = params;
    *q++ = '['; *q++ = '"';
    for (size_t i = 0; i < nbytes; i += 3) {
        unsigned v = bytes[i] << 16;
        if (i + 1 < nbytes) v |= bytes[i + 1] << 8;
        if (i + 2 < nbytes) v |= bytes[i + 2];
        *q++ = B64[(v >> 18) & 63];
        *q++ = B64[(v >> 12) & 63];
        *q++ = (i + 1 < nbytes) ? B64[(v >> 6) & 63] : '=';
        *q++ = (i + 2 < nbytes) ? B64[v & 63] : '=';
    }
    *q++ = '"'; *q++ = ']'; *q = '\0';
    char out[64];
    int rc = engine_client_call(c, "push_audio", params, out, sizeof out);
    free(params);
    return rc;
}

const char* engine_client_last_error(const EngineClient* c) {
    return c ? c->err : "null client";
}

void engine_client_close(EngineClient* c) {
    if (!c) return;
    if (c->to_child) {
        fputs("quit\n", c->to_child);
        fflush(c->to_child);
        fclose(c->to_child);
    }
    if (c->from_child) fclose(c->from_child);
    if (c->pid > 0) {
        int status;
        waitpid(c->pid, &status, 0);
    }
    free(c);
}
