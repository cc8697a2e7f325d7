import sys, time
from pathlib import Path
import tempfile, yaml
base = Path(tempfile.mkdtemp(prefix="mpnet_reval_"))
from instacart_next_order_recommendation_tpu.data.synthetic import generate_instacart_csvs
from instacart_next_order_recommendation_tpu.data import InstacartDataPrep
d = generate_instacart_csvs(base/"data", n_users=2000, n_products=4000, seed=0)
prep = InstacartDataPrep(data_dir=d, output_dir=base/"processed", eval_frac=0.1)
prep.prepare()
cfgy = dict(processed_dir=str(prep.effective_output_dir()), output_dir=str(base/"out"),
            model_name="mpnet-base", epochs=1, train_batch_size=32, max_seq_length=128,
            logging_steps=50, run_information_retrieval_evaluator=True, vocab_size=30000)
p = base/"train.yaml"; p.write_text(yaml.safe_dump(cfgy))
sys.argv = ["prog", "--config", str(p)]
from instacart_next_order_recommendation_tpu.train.trainer import main
t0=time.time(); main(); print(f"MPNET_REVAL_OK total {time.time()-t0:.0f}s")
