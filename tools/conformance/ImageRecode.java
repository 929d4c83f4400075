import java.awt.image.BufferedImage;
import java.io.File;
import javax.imageio.ImageIO;

/**
 * Re-encode every .bmp in a directory via javax.imageio as PNG and
 * baseline JPEG — THIRD-PARTY-encoded streams (ImageIO's own filter
 * selection, Huffman tables, and subsampling choices) for
 * tests/test_codec_conformance.py to feed the pure-Python decoders.
 */
public final class ImageRecode {
    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        for (File f : dir.listFiles()) {
            String n = f.getName();
            if (!n.endsWith(".bmp")) continue;
            BufferedImage img = ImageIO.read(f);
            if (img == null) { System.out.println("SKIP " + n); continue; }
            String base = f.getPath().substring(0, f.getPath().length() - 4);
            ImageIO.write(img, "png", new File(base + ".iio.png"));
            ImageIO.write(img, "jpg", new File(base + ".iio.jpg"));
            ImageIO.write(img, "gif", new File(base + ".iio.gif"));
            System.out.println("OK " + n);
        }
    }
}
