// Concurrency stress for the epoll HTTP server + count fast path, built
// under TSan/ASan (make stress). Exercises every cross-thread edge in one
// process with NO Python: worker handler dispatch, fast-path match on the
// I/O thread, the drainer protocol (wait/respond), register/clear churn
// racing the matcher, keep-alive + Connection: close, connection recycling,
// and server shutdown racing a blocked drainer.
//
// Exit 0 = clean run; the sanitizers abort (TSAN_OPTIONS/ASAN_OPTIONS set
// halt_on_error by the test harness) on any finding.

#include "silo_http.cpp"

#include <string.h>

#include <random>

namespace {

// Handler for unmatched (slow-path) requests: respond immediately.
void stress_handler(void* req, const char* method, const char* target,
                    const char* body, int64_t body_len) {
  (void)method;
  (void)target;
  (void)body;
  static const char kBody[] = "{\"queryResult\": [{\"count\": 7}]}";
  silo_http_respond(req, 200, kBody, int64_t(sizeof(kBody) - 1), "v1");
  (void)body_len;
}

int connect_client(int port) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr;
  memset(&addr, 0, sizeof(addr));
  addr.sin_family = AF_INET;
  addr.sin_port = htons(uint16_t(port));
  inet_pton(AF_INET, "127.0.0.1", &addr.sin_addr);
  if (connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    close(fd);
    return -1;
  }
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  return fd;
}

// Read exactly one HTTP response (headers + content-length body).
bool read_response(int fd, std::string& acc) {
  char buf[8192];
  while (true) {
    size_t head_end = acc.find("\r\n\r\n");
    if (head_end != std::string::npos) {
      size_t cl = 0;
      size_t pos = acc.find("Content-Length:");
      if (pos != std::string::npos && pos < head_end)
        cl = size_t(atoll(acc.c_str() + pos + 15));
      size_t total = head_end + 4 + cl;
      if (acc.size() >= total) {
        acc.erase(0, total);
        return true;
      }
    }
    ssize_t r = recv(fd, buf, sizeof(buf), 0);
    if (r <= 0) return false;
    acc.append(buf, size_t(r));
  }
}

std::string post(const std::string& body, bool keep_alive) {
  std::string r = "POST /query HTTP/1.1\r\nHost: s\r\n";
  if (!keep_alive) r += "Connection: close\r\n";
  r += "Content-Length: " + std::to_string(body.size()) + "\r\n\r\n" + body;
  return r;
}

}  // namespace

int main(int argc, char** argv) {
  double seconds = argc > 1 ? atof(argv[1]) : 2.0;
  int sid = silo_http_create("127.0.0.1", 0, 4, stress_handler);
  if (sid < 0) {
    fprintf(stderr, "bind failed\n");
    return 2;
  }
  int port = silo_http_port(sid);
  std::atomic<bool> stop{false};
  std::atomic<long> served{0};

  // Drainer: batch-pop fast-path tasks, answer with counts (handle value).
  std::thread drainer([&] {
    uint64_t keys[512];
    uint32_t handles[512];
    int64_t counts[512];
    while (true) {
      int n = silo_fastpath_wait(sid, keys, handles, 512, 50);
      if (n < 0) return;  // server stopping
      if (n == 0) continue;
      for (int i = 0; i < n; i++) counts[i] = int64_t(handles[i]);
      // half the batches answer as errors to cover both completion paths
      if (handles[0] % 2 == 0) {
        silo_fastpath_respond_counts(sid, keys, counts, n, "v1");
      } else {
        static const char kErr[] = "{\"error\": \"stress\"}";
        silo_fastpath_respond_error(sid, keys, n, 500, kErr,
                                    int64_t(sizeof(kErr) - 1));
      }
    }
  });

  // Churn: register/clear racing the I/O thread's matcher.
  std::thread churn([&] {
    uint32_t gen = 0;
    while (!stop.load()) {
      for (int k = 0; k < 8; k++) {
        std::string body = "fp" + std::to_string(k);
        silo_fastpath_register(sid, body.data(), int64_t(body.size()),
                               (gen << 8) | uint32_t(k));
      }
      gen++;
      std::this_thread::sleep_for(std::chrono::milliseconds(2));
      silo_fastpath_clear(sid);
    }
  });

  std::vector<std::thread> clients;
  for (int t = 0; t < 8; t++) {
    clients.emplace_back([&, t] {
      std::mt19937 rng(uint32_t(t) * 2654435761u + 1);
      int fd = connect_client(port);
      std::string acc;
      int on_conn = 0;
      while (!stop.load() && fd >= 0) {
        bool fast = (rng() & 1) != 0;
        bool keep = (rng() % 8) != 0 || fast;
        std::string body =
            fast ? ("fp" + std::to_string(rng() % 8))
                 : ("slow" + std::to_string(rng() % 16));
        std::string req = post(body, keep);
        if (send(fd, req.data(), req.size(), MSG_NOSIGNAL) !=
            ssize_t(req.size())) {
          close(fd);
          fd = connect_client(port);
          acc.clear();
          continue;
        }
        if (!read_response(fd, acc) || !keep || ++on_conn >= 64) {
          close(fd);
          fd = connect_client(port);
          acc.clear();
          on_conn = 0;
        }
        served.fetch_add(1);
      }
      if (fd >= 0) close(fd);
    });
  }

  std::this_thread::sleep_for(
      std::chrono::milliseconds(long(seconds * 1000)));
  stop.store(true);
  for (auto& t : clients) t.join();
  churn.join();
  silo_http_stop(sid);  // wakes + terminates the drainer (-1)
  drainer.join();
  fprintf(stderr, "served %ld requests\n", served.load());
  return served.load() > 0 ? 0 : 3;
}
