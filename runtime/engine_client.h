/* C embedding client for the audio_analyzer_rs_tpu engine.
 *
 * The reference exposes its engine to Swift/Kotlin via uniffi-generated
 * bindings (ref src/lib.rs + Cargo `bindgen` feature).  The equivalent
 * boundary here is the newline-delimited JSON-RPC server
 * (audio_analyzer_rs_tpu/api/rpc.py); this client spawns it as a child
 * process and gives C/C++ hosts a typed-enough handle: send any method,
 * get the raw JSON result back.
 *
 * All functions return 0 on success, -1 on failure (see engine_last_error).
 * Responses are NUL-terminated JSON of the "result" value, written into the
 * caller's buffer (truncated if too small — an engine poll payload is well
 * under 4 KiB).
 */
#ifndef AUDIO_ANALYZER_ENGINE_CLIENT_H
#define AUDIO_ANALYZER_ENGINE_CLIENT_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct EngineClient EngineClient;

/* engine_client_spawn_opts flags. */
enum {
    /* Do NOT flip a SIG_DFL SIGPIPE disposition to SIG_IGN.  By default
     * the client ignores SIGPIPE (only when the app left it at SIG_DFL)
     * so a dead engine surfaces as EPIPE instead of killing the host;
     * pass this flag if the host deliberately relies on default SIGPIPE
     * termination for its own pipes. */
    ENGINE_CLIENT_KEEP_SIGPIPE = 1u << 0,
};

/* Spawn the RPC server (argv override optional; NULL = default
 * "python3 -m audio_analyzer_rs_tpu.api.rpc" resolved via PATH with the
 * current working directory on PYTHONPATH). */
EngineClient* engine_client_spawn(const char* python_exe,
                                  const char* repo_root);

/* As engine_client_spawn, with behavior flags (ENGINE_CLIENT_*). */
EngineClient* engine_client_spawn_opts(const char* python_exe,
                                       const char* repo_root,
                                       unsigned flags);

/* Call `method` with raw JSON `params_json` (e.g. "[1.5]", "[]", or NULL
 * for no params).  The result JSON (or error message) lands in out. */
int engine_client_call(EngineClient* c, const char* method,
                       const char* params_json,
                       char* out, size_t out_len);

/* Push raw mono float32 samples to the virtual input (base64'd for you). */
int engine_client_push_audio(EngineClient* c, const float* samples,
                             size_t n);

/* ── Multi-session (server methods session.create / pool.join — the
 * server hosts K engines and can batch their slot waves into one device
 * dispatch; see api/rpc.py + api/pool.py).  `session` addresses one
 * hosted engine; pass a negative session to omit the field (the server
 * then routes to session 0, so the plain calls above are the session<0
 * case). ── */

/* Session-addressed engine_client_call. */
int engine_client_call_session(EngineClient* c, int session,
                               const char* method, const char* params_json,
                               char* out, size_t out_len);

/* Session-addressed engine_client_push_audio. */
int engine_client_push_audio_session(EngineClient* c, int session,
                                     const float* samples, size_t n);

/* session.create with optional engine config JSON (NULL = server
 * defaults; e.g. "{\"loopback_gain\": 1.0}").  Returns the new session
 * id (>= 1), or -1 on failure. */
int engine_client_session_create(EngineClient* c, const char* cfg_json);

/* pool.join with optional config JSON (NULL = defaults; e.g.
 * "{\"pipeline_depth\": 1, \"aggregate_slots\": 2}").  Pools EVERY
 * session on the server; returns the pooled session count K, or -1. */
int engine_client_pool_join(EngineClient* c, const char* cfg_json);

/* Last error message (valid until the next call on this client). */
const char* engine_client_last_error(const EngineClient* c);

/* Send "quit" and reap the child. */
void engine_client_close(EngineClient* c);

#ifdef __cplusplus
}
#endif

#endif /* AUDIO_ANALYZER_ENGINE_CLIENT_H */
