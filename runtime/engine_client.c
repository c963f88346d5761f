/* See engine_client.h.  POSIX-only (fork/pipe), like the reference's
 * desktop targets.  engine_client_spawn sets SIGPIPE to SIG_IGN iff the
 * application left it at SIG_DFL: writes to a dead engine must surface as
 * EPIPE (-1 with an error message) rather than kill the embedding
 * application, but an installed handler is never clobbered. */

#define _POSIX_C_SOURCE 200809L

#include "engine_client.h"

#include <errno.h>
#include <fcntl.h>
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

static void close_pair(int fds[2]) {
    if (fds[0] >= 0) close(fds[0]);
    if (fds[1] >= 0) close(fds[1]);
}

EngineClient* engine_client_spawn_opts(const char* python_exe,
                                       const char* repo_root,
                                       unsigned flags) {
    /* A write to a pipe whose reader died must not kill the host app —
     * but only take over the disposition if the application hasn't
     * installed its own handler, and only unless the host opted out
     * (ENGINE_CLIENT_KEEP_SIGPIPE) because it relies on default SIGPIPE
     * termination for its own pipes. */
    if (!(flags & ENGINE_CLIENT_KEEP_SIGPIPE)) {
        struct sigaction sa;
        if (sigaction(SIGPIPE, NULL, &sa) == 0 && sa.sa_handler == SIG_DFL) {
            signal(SIGPIPE, SIG_IGN);
        }
    }

    int in_pipe[2] = {-1, -1}, out_pipe[2] = {-1, -1};
    int status_pipe[2] = {-1, -1};   /* CLOEXEC: reports exec failure */
    if (pipe(in_pipe) != 0) return NULL;
    if (pipe(out_pipe) != 0) { close_pair(in_pipe); return NULL; }
    if (pipe(status_pipe) != 0 ||
        fcntl(status_pipe[1], F_SETFD, FD_CLOEXEC) != 0) {
        close_pair(in_pipe); close_pair(out_pipe); close_pair(status_pipe);
        return NULL;
    }

    pid_t pid = fork();
    if (pid < 0) {
        close_pair(in_pipe); close_pair(out_pipe); close_pair(status_pipe);
        return NULL;
    }
    if (pid == 0) {
        /* child: stdin ← in_pipe, stdout → out_pipe, stderr inherited */
        dup2(in_pipe[0], 0);
        dup2(out_pipe[1], 1);
        close(in_pipe[0]); close(in_pipe[1]);
        close(out_pipe[0]); close(out_pipe[1]);
        close(status_pipe[0]);
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
        /* exec failed: report errno through the CLOEXEC pipe. */
        unsigned char e = (unsigned char)(errno ? errno : 1);
        ssize_t ignored = write(status_pipe[1], &e, 1);
        (void)ignored;
        _exit(127);
    }
    close(in_pipe[0]);  in_pipe[0] = -1;
    close(out_pipe[1]); out_pipe[1] = -1;
    close(status_pipe[1]); status_pipe[1] = -1;

    /* EOF on the status pipe (CLOEXEC) means exec succeeded; one byte
     * means it failed with that errno. */
    unsigned char exec_err = 0;
    ssize_t got = read(status_pipe[0], &exec_err, 1);
    close(status_pipe[0]);
    if (got > 0) {
        close(in_pipe[1]);
        close(out_pipe[0]);
        waitpid(pid, NULL, 0);
        errno = exec_err;
        return NULL;
    }

    EngineClient* c = calloc(1, sizeof *c);
    if (!c) {
        close(in_pipe[1]); close(out_pipe[0]);
        kill(pid, SIGTERM); waitpid(pid, NULL, 0);
        return NULL;
    }
    c->pid = pid;
    c->to_child = fdopen(in_pipe[1], "w");
    c->from_child = fdopen(out_pipe[0], "r");
    c->next_id = 1;
    if (!c->to_child || !c->from_child) {
        /* Close whatever opened; raw fds for the rest, then reap. */
        if (c->to_child) fclose(c->to_child); else close(in_pipe[1]);
        if (c->from_child) fclose(c->from_child); else close(out_pipe[0]);
        waitpid(pid, NULL, 0);   /* stdin EOF → server exits */
        free(c);
        return NULL;
    }
    return c;
}

EngineClient* engine_client_spawn(const char* python_exe,
                                  const char* repo_root) {
    return engine_client_spawn_opts(python_exe, repo_root, 0);
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

/* Locate the "id" key anywhere in the response envelope and parse its
 * integer value; returns -1 if absent/non-numeric (null id → -1 too,
 * which can never equal a real request id ≥ 1). */
static int response_id(const char* line) {
    const char* p = strstr(line, "\"id\"");
    if (!p) return -1;
    p += 4;
    while (*p == ' ' || *p == '\t' || *p == ':') p++;
    if (*p < '0' || *p > '9') return -1;
    return (int)strtol(p, NULL, 10);
}

int engine_client_call_session(EngineClient* c, int session,
                               const char* method, const char* params_json,
                               char* out, size_t out_len) {
    if (!c || !method) return -1;
    if (out && out_len) out[0] = '\0';
    int id = c->next_id++;
    int wrc;
    const char* params = (params_json && *params_json) ? params_json : "[]";
    if (session >= 0) {
        /* Multi-session servers route on the "session" field; requests
         * without it address session 0 (api/rpc.py). */
        wrc = fprintf(c->to_child,
                      "{\"id\": %d, \"session\": %d, \"method\": \"%s\", "
                      "\"params\": %s}\n", id, session, method, params);
    } else {
        wrc = fprintf(c->to_child, "{\"id\": %d, \"method\": \"%s\", "
                                   "\"params\": %s}\n", id, method, params);
    }
    if (wrc < 0 || fflush(c->to_child) != 0) {
        set_err(c, "write to engine failed");
        return -1;
    }
    /* getline: responses (poll_onsets, poll_errors, metrics) can exceed
     * any fixed buffer; a truncated read would desynchronize the protocol
     * forever. */
    char* line = NULL;
    size_t cap = 0;
    ssize_t len = getline(&line, &cap, c->from_child);
    if (len < 0) {
        free(line);
        set_err(c, "engine closed the pipe");
        return -1;
    }
    /* The server echoes our id; a mismatch means the stream is
     * desynchronized (a bug, or a stale response) — fail loudly.  The id
     * is located by key, not byte offset, so server-side serialization
     * details (key order, separators) can change freely. */
    if (response_id(line) != id) {
        set_err(c, "response id mismatch (protocol desync)");
        free(line);
        return -1;
    }
    int rc = 0;
    if (strstr(line, "\"error\"")) {
        extract_value(line, "error", c->err, sizeof c->err);
        rc = -1;
    } else if (out && out_len &&
               extract_value(line, "result", out, out_len) != 0) {
        set_err(c, "malformed response");
        rc = -1;
    }
    free(line);
    return rc;
}

int engine_client_call(EngineClient* c, const char* method,
                       const char* params_json,
                       char* out, size_t out_len) {
    return engine_client_call_session(c, -1, method, params_json,
                                      out, out_len);
}

static const char B64[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

int engine_client_push_audio_session(EngineClient* c, int session,
                                     const float* samples, size_t n) {
    /* The wire format is little-endian float32 (rpc.py decodes "<f4"). */
    const unsigned char* bytes = (const unsigned char*)samples;
    size_t nbytes = n * sizeof(float);
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
    unsigned char* le = malloc(nbytes ? nbytes : 1);
    if (!le) { set_err(c, "oom"); return -1; }
    for (size_t i = 0; i < nbytes; i += 4) {
        le[i] = bytes[i + 3]; le[i + 1] = bytes[i + 2];
        le[i + 2] = bytes[i + 1]; le[i + 3] = bytes[i];
    }
    bytes = le;
#endif
    size_t b64len = 4 * ((nbytes + 2) / 3);
    /* params: ["<base64>"] */
    char* params = malloc(b64len + 8);
    if (!params) {
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
        free(le);
#endif
        set_err(c, "oom");
        return -1;
    }
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
    int rc = engine_client_call_session(c, session, "push_audio", params,
                                        out, sizeof out);
    free(params);
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
    free(le);
#endif
    return rc;
}

int engine_client_push_audio(EngineClient* c, const float* samples,
                             size_t n) {
    return engine_client_push_audio_session(c, -1, samples, n);
}

/* Parse the leading integer of a JSON result ("3" / "{\"k\": 3}"). */
static int leading_int(const char* s, const char* key) {
    if (key) {
        char pat[32];
        snprintf(pat, sizeof pat, "\"%s\":", key);
        const char* p = strstr(s, pat);
        if (!p) return -1;
        s = p + strlen(pat);
    }
    while (*s == ' ' || *s == '\t') s++;
    if (*s < '0' || *s > '9') return -1;
    return (int)strtol(s, NULL, 10);
}

int engine_client_session_create(EngineClient* c, const char* cfg_json) {
    char params[512];
    snprintf(params, sizeof params, "[%s]",
             (cfg_json && *cfg_json) ? cfg_json : "{}");
    char out[64];
    if (engine_client_call(c, "session.create", params, out, sizeof out))
        return -1;
    int sid = leading_int(out, NULL);
    if (sid < 1) { set_err(c, "unparseable session id"); return -1; }
    return sid;
}

int engine_client_pool_join(EngineClient* c, const char* cfg_json) {
    char params[512];
    snprintf(params, sizeof params, "[%s]",
             (cfg_json && *cfg_json) ? cfg_json : "{}");
    char out[128];
    if (engine_client_call(c, "pool.join", params, out, sizeof out))
        return -1;
    int k = leading_int(out, "k");
    if (k < 1) { set_err(c, "unparseable pool.join result"); return -1; }
    return k;
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
