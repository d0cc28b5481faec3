"""Single-image predict (reference demo/image_classification/predict.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data.transforms import Compose, Normalize, Resize, ToTensor
from tlxcv_tpu.models import vgg11
from tlxcv_tpu.tasks import ImageClassification
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    import cv2

    transform = Compose([
        Resize((224, 224)),
        Normalize(mean=(125.31, 122.95, 113.86), std=(62.99, 62.09, 66.70)),
        ToTensor(),
    ])
    image = cv2.cvtColor(cv2.imread("./demo/image_classification/dog.jpg"),
                         cv2.COLOR_BGR2RGB)
    x = transform(image)[None]

    model = ImageClassification(vgg11(batch_norm=True, num_classes=10))
    model.load_weights("./demo/image_classification/model.npz")
    trainer = Trainer(network=model)
    logits = np.asarray(trainer.predict(x))
    print("class:", logits.argmax(-1))
