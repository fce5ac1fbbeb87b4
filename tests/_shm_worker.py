"""Subprocess worker for the cross-process shm-topic test: attaches to the
named topic and publishes `n` 64-byte payloads, each the 8-byte counter
value repeated 8x (so any torn read shows mixed words)."""

import struct
import sys

from mpc_ros_tpu.native import ShmTopic


def main() -> None:
    name, n = sys.argv[1], int(sys.argv[2])
    t = ShmTopic(name)
    for i in range(1, n + 1):
        t.publish(struct.pack("<8Q", *([i] * 8)))
    t.close()
    print("done", flush=True)


if __name__ == "__main__":
    main()
