"""Command-line entry points (L4 of the reference layer map).

Mapping to the reference's scripts (SURVEY.md section 2.6):

=========================  ==========================================
``pci_tpu.cli.train``        train.py (ISAPCInet on nuScenes)
``pci_tpu.cli.test``         test.py (mean CD, optional EMD)
``pci_tpu.cli.demo``         demo.py / visualize_demo_file.py
``pci_tpu.cli.demo_generate``demo_generate.py
``pci_tpu.cli.demo_save_numpy`` demo_save_numpy.py
``pci_tpu.cli.visualize_hot_map`` visualize_hot_map.py
``pci_tpu.cli.video_generate``  Utils/VideoGenerate.py
``pci_tpu.cli.train_sceneflow`` PointINet20230424/train_sceneflow.py
``pci_tpu.cli.train_interp``    PointINet20230424/train_interp.py
``pci_tpu.cli.test_pointinet``  PointINet20230424/test.py
``pci_tpu.cli.train_polypci``   PolyPCI/{train,test}.py (fixed)
=========================  ==========================================
"""
