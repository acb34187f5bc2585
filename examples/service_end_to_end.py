"""Example: run the segmentation service end-to-end on localhost.

Starts the REST backend with the bronchus algorithm registered, uploads a
synthetic CT through the client SDK, triggers the algorithm, polls, and
downloads the output segmentation.

Run: python examples/service_end_to_end.py
"""

import os
import tempfile
import threading
import time

import numpy as np


def main():
    import jax

    from platipy_tpu.backend.api import make_server
    from platipy_tpu.backend.application import ServiceApp
    from platipy_tpu.client import PlatiPyClient
    from platipy_tpu.core.image import from_array
    from platipy_tpu.nifti.io import write_image

    work = tempfile.mkdtemp()
    app = ServiceApp(database_path=os.path.join(work, "svc.db"), max_workers=1)
    app.data_directory = os.path.join(work, "data")

    @app.register("Threshold Demo", default_settings={"threshold": 0.5})
    def threshold_demo(data_objects, working_dir, settings):
        from platipy_tpu.nifti.io import read_image

        img = read_image(data_objects[0]["path"])
        mask = img.with_array((np.asarray(img.array) > settings["threshold"])
                              .astype(np.uint8))
        out = os.path.join(working_dir, "mask.nii.gz")
        write_image(mask, out)
        return [{"path": out, "parent_id": data_objects[0]["id"]}]

    key = app.database.add_api_key("demo-user")
    server = make_server(app, host="127.0.0.1", port=8765)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    time.sleep(0.2)

    client = PlatiPyClient("127.0.0.1", 8765, key, "Threshold Demo")
    dataset = client.add_dataset()
    ct = from_array(np.random.RandomState(0).rand(8, 16, 16).astype(np.float32))
    path = os.path.join(work, "ct.nii.gz")
    write_image(ct, path)
    client.add_data_object(dataset, file_path=path)

    for status in client.run_algorithm(dataset):
        print("task state:", status.get("state", status))
    outputs = client.download_output_objects(dataset, os.path.join(work, "out"))
    print("downloaded outputs:", outputs)
    server.shutdown()


if __name__ == "__main__":
    main()
