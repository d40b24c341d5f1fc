// TSAN stress driver for the threaded native RTP edge: concurrent sender
// and reader host threads over loopback UDP, 64 legs alternating
// AES-CM/AEAD-GCM SRTP, internal tx/rx worker pools. Build with
//   g++ -O1 -g -fsanitize=thread -march=native -pthread \
//       tools/edge_tsan.cpp mediastreamer2_tpu/native/rtp_edge.cpp \
//       -o /tmp/edge_tsan -ldl && /tmp/edge_tsan
// Exit 0 + "got=..." line and no TSAN report = race-free run. This is
// the mixed-fleet concurrency shape (FleetTicker members dispatching
// edge calls from separate host threads; reference parity: per-stream
// ticker threads each running oRTP socket IO + libsrtp, msticker.c:448).
#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* ms2_rtptx_create(int, int, int);
void ms2_rtptx_destroy(void*);
void ms2_rtptx_config(void*, int, const char*, int, uint32_t, uint16_t,
                      uint32_t, uint8_t);
int ms2_rtptx_send(void*, const uint8_t*, const uint8_t*, uint32_t);
void ms2_rtptx_set_gso(void*, int);
void ms2_rtptx_set_threads(void*, int);
int ms2_rtptx_set_srtp(void*, int, const uint8_t*, int, const uint8_t*,
                       const uint8_t*, int, int);
void* ms2_rtprx_create(int, int, int);
void ms2_rtprx_destroy(void*);
void ms2_rtprx_add_fd(void*, int);
void ms2_rtprx_map_ssrc(void*, uint32_t, int);
void ms2_rtprx_set_prefill(void*, int, int);
void ms2_rtprx_set_threads(void*, int);
int ms2_rtprx_poll(void*);
void ms2_rtprx_read_tick(void*, uint8_t*, uint8_t*);
int ms2_rtprx_set_srtp(void*, int, const uint8_t*, int, const uint8_t*,
                       const uint8_t*, int, int);
uint64_t ms2_rtprx_auth_failures(void*, int);
}

int main() {
  const int N = 64, PSZ = 80, TICKS = 300;
  int txs = socket(AF_INET, SOCK_DGRAM, 0);
  int rxs = socket(AF_INET, SOCK_DGRAM, 0);
  sockaddr_in a{};
  a.sin_family = AF_INET;
  a.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  bind(txs, (sockaddr*)&a, sizeof a);
  bind(rxs, (sockaddr*)&a, sizeof a);
  socklen_t alen = sizeof a;
  getsockname(rxs, (sockaddr*)&a, &alen);
  int port = ntohs(a.sin_port);
  // non-blocking rx
  timeval tv{0, 1000};
  setsockopt(rxs, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof tv);
  int one = 1 << 22;
  setsockopt(rxs, SOL_SOCKET, SO_RCVBUF, &one, sizeof one);

  void* tx = ms2_rtptx_create(txs, N, PSZ);
  void* rx = ms2_rtprx_create(N, PSZ, 64);
  ms2_rtprx_add_fd(rx, rxs);
  uint8_t ke[16], ks[14], ka[20];
  for (int i = 0; i < 16; i++) ke[i] = uint8_t(i);
  for (int i = 0; i < 14; i++) ks[i] = uint8_t(i);
  for (int i = 0; i < 20; i++) ka[i] = uint8_t(i);
  for (int i = 0; i < N; i++) {
    ms2_rtptx_config(tx, i, "127.0.0.1", port, 0x4000 + i, 1, 0, 0);
    ms2_rtprx_map_ssrc(rx, 0x4000 + i, i);
    ms2_rtprx_set_prefill(rx, i, 0);
    int suite_gcm = i & 1;  // alternate CM / GCM legs
    ms2_rtptx_set_srtp(tx, i, ke, 16, ks, ka, suite_gcm ? 16 : 10, suite_gcm);
    ms2_rtprx_set_srtp(rx, i, ke, 16, ks, ka, suite_gcm ? 16 : 10, suite_gcm);
  }
  int workers = 3;
  if (const char* w = getenv("EDGE_TSAN_THREADS")) workers = atoi(w);
  ms2_rtptx_set_threads(tx, workers);
  ms2_rtprx_set_threads(rx, workers);
  if (const char* g = getenv("EDGE_TSAN_GSO"); g && atoi(g)) {
    // single-destination fast path: kernel splits one send into
    // segments (UDP_SEGMENT); covers send_gso_range under the pool
    connect(txs, (sockaddr*)&a, sizeof a);
    ms2_rtptx_set_gso(tx, 1);
  }

  std::vector<uint8_t> pay(size_t(N) * PSZ);
  for (size_t i = 0; i < pay.size(); i++) pay[i] = uint8_t(i * 31);

  std::thread sender([&] {
    for (int t = 0; t < TICKS; t++) {
      ms2_rtptx_send(tx, pay.data(), nullptr, 80);
      usleep(1000);
    }
  });
  uint64_t got = 0;
  std::vector<uint8_t> out(size_t(N) * PSZ), flags(N);
  std::thread reader([&] {
    for (int t = 0; t < TICKS + 50; t++) {
      got += uint64_t(ms2_rtprx_poll(rx));
      ms2_rtprx_read_tick(rx, out.data(), flags.data());
      usleep(1000);
    }
  });
  sender.join();
  reader.join();
  uint64_t auth = 0;
  for (int i = 0; i < N; i++) auth += ms2_rtprx_auth_failures(rx, i);
  ms2_rtptx_destroy(tx);
  ms2_rtprx_destroy(rx);
  close(txs);
  close(rxs);
  printf("got=%llu auth_fail=%llu\n", (unsigned long long)got,
         (unsigned long long)auth);
  return auth != 0;
}
