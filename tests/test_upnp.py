"""uPnP IGD client against an in-process fake gateway (SSDP unicast reply
+ HTTP SOAP WANIPConnection)."""
import http.server
import re
import socket
import threading

import pytest

from mediastreamer2_tpu.net import upnp


class FakeIgdHandler(http.server.BaseHTTPRequestHandler):
    mappings = {}

    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path == "/desc.xml":
            body = (f"<root><device><serviceList><service>"
                    f"<serviceType>{upnp.SERVICE_WANIP}</serviceType>"
                    f"<controlURL>/ctl</controlURL>"
                    f"</service></serviceList></device></root>").encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        action = self.headers.get("SOAPAction", "")
        if "AddPortMapping" in action:
            port = re.search(r"<NewExternalPort>(\d+)</NewExternalPort>",
                             body).group(1)
            proto = re.search(r"<NewProtocol>(\w+)</NewProtocol>",
                              body).group(1)
            FakeIgdHandler.mappings[(port, proto)] = body
            resp = "<AddPortMappingResponse/>"
        elif "DeletePortMapping" in action:
            port = re.search(r"<NewExternalPort>(\d+)</NewExternalPort>",
                             body).group(1)
            proto = re.search(r"<NewProtocol>(\w+)</NewProtocol>",
                              body).group(1)
            FakeIgdHandler.mappings.pop((port, proto), None)
            resp = "<DeletePortMappingResponse/>"
        elif "GetExternalIPAddress" in action:
            resp = ("<GetExternalIPAddressResponse>"
                    "<NewExternalIPAddress>198.51.100.77"
                    "</NewExternalIPAddress></GetExternalIPAddressResponse>")
        else:
            self.send_error(500)
            return
        out = f"<s:Envelope><s:Body>{resp}</s:Body></s:Envelope>".encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture
def fake_igd():
    srv = http.server.HTTPServer(("127.0.0.1", 0), FakeIgdHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    FakeIgdHandler.mappings = {}
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _ssdp_responder(location, sock):
    def run():
        try:
            data, addr = sock.recvfrom(4096)
            if b"M-SEARCH" in data:
                resp = (f"HTTP/1.1 200 OK\r\nST: {upnp.ST_IGD}\r\n"
                        f"LOCATION: {location}/desc.xml\r\n\r\n").encode()
                sock.sendto(resp, addr)
        except OSError:
            pass
    threading.Thread(target=run, daemon=True).start()


def test_discovery_and_mapping(fake_igd):
    # fake SSDP endpoint on a unicast UDP port
    ssdp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    ssdp.bind(("127.0.0.1", 0))
    _ssdp_responder(fake_igd, ssdp)
    locs = upnp.ssdp_msearch(timeout_s=1.0,
                             addr=("127.0.0.1", ssdp.getsockname()[1]))
    assert locs == [fake_igd + "/desc.xml"]

    # direct client against the fake control URL
    client = upnp.UpnpIgdClient(fake_igd + "/ctl")
    assert client.get_external_ip() == "198.51.100.77"
    assert client.add_port_mapping(7078, 7078, "192.168.1.50")
    assert ("7078", "UDP") in FakeIgdHandler.mappings
    assert client.mappings == [(7078, "UDP")]
    assert client.delete_port_mapping(7078)
    assert ("7078", "UDP") not in FakeIgdHandler.mappings


def test_discover_via_description(fake_igd):
    ssdp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    ssdp.bind(("127.0.0.1", 0))
    _ssdp_responder(fake_igd, ssdp)
    import mediastreamer2_tpu.net.upnp as u
    old = u.SSDP_ADDR
    u.SSDP_ADDR = ("127.0.0.1", ssdp.getsockname()[1])
    try:
        client = upnp.UpnpIgdClient.discover(timeout_s=1.0)
    finally:
        u.SSDP_ADDR = old
    assert client is not None
    assert client.control_url == fake_igd + "/ctl"
