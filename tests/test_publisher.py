import time

import numpy as np

from airslam_tpu.io import publisher as pub


def test_topic_publisher_fanout_and_drain():
    p = pub.TopicPublisher("test")
    got = []
    p.register(lambda m: got.append(m))
    p.start()
    for i in range(5):
        p.publish(i)
    t0 = time.time()
    while len(got) < 5 and time.time() - t0 < 2.0:
        time.sleep(0.01)
    p.stop()
    assert got == [0, 1, 2, 3, 4]


def test_publisher_respects_config_toggles():
    class Cfg:
        frame_pose = True
        map = False

    p = pub.Publisher(Cfg())
    poses, maps = [], []
    p.register("frame_pose", poses.append)
    p.register("map", maps.append)
    p.publish_frame_pose(pub.FramePoseMessage(time=0.0, pose=np.eye(4)))
    p.publish_map(pub.MapMessage(time=0.0, points=np.zeros((1, 3))))
    t0 = time.time()
    while not poses and time.time() - t0 < 2.0:
        time.sleep(0.01)
    p.shutdown()
    assert len(poses) == 1
    assert len(maps) == 0  # disabled topic


def test_stop_drains_pending_messages():
    p = pub.TopicPublisher("drain")
    got = []
    p.register(got.append)
    # never started — publish then stop must still deliver
    p.publish("a")
    p.publish("b")
    p.stop()
    assert got == ["a", "b"]
