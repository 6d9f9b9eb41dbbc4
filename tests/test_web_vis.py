"""Viewer server: endpoints, payload flow, capture round trip."""
import json
import threading
import urllib.request
from multiprocessing import Queue

import numpy as np
import pytest

from sixdof_tpu.app import web_vis
from sixdof_tpu.io.mesh_io import PointCloud, TriMesh


@pytest.fixture(scope="module")
def server():
    data_q = Queue()
    capture_q = Queue()
    port = 18123
    t = threading.Thread(
        target=web_vis.run_dash_app, args=(data_q, capture_q, "127.0.0.1", 18123), daemon=True
    )
    t.start()
    import time

    time.sleep(0.5)
    return capture_q


def test_page_and_data_and_capture(server):
    capture_q = server
    page = urllib.request.urlopen("http://127.0.0.1:18123/").read().decode()
    assert "Defect Visualization" in page and "Capture New Data" in page

    mesh = TriMesh(np.random.rand(10, 3), np.array([[0, 1, 2], [2, 3, 4]]))
    pcd = PointCloud(np.random.rand(5, 3), colors=np.random.rand(5, 3))
    web_vis.update_dash_data([pcd], mesh)

    data = json.loads(urllib.request.urlopen("http://127.0.0.1:18123/data").read())
    assert len(data["vertices"]) == 10
    assert len(data["pcds"]) == 1 and len(data["pcds"][0]["points"]) == 5
    assert data["seq"] >= 1

    req = urllib.request.Request("http://127.0.0.1:18123/capture", method="POST")
    urllib.request.urlopen(req)
    assert capture_q.get(timeout=2) is True
